"""Command-line entry point (reference ppdiffusers/commands/: `ppdiffusers-cli
env` + fp16_safetensors converter).

Subcommands:
  env                      — print environment/debug info for bug reports
  fp16-safetensors PATH    — re-save a checkpoint dir's weights in fp16/bf16
  convert PATH OUT         — convert a torch .bin/.safetensors state dict to
                             a flax msgpack checkpoint for a given model class
  convert-pipeline SRC OUT — convert a whole diffusers-layout pipeline dir
                             (or a single-file LDM .ckpt/.safetensors) to a
                             native pipeline dir. One generic command in
                             place of the reference's 16 per-family scripts
                             (ppdiffusers/scripts/convert_diffusers_model/):
                             the registry + per-model torch key maps resolve
                             every family the registry knows
"""

from __future__ import annotations

import argparse
import os
import platform
import sys


def cmd_env(_args) -> int:
    import jax

    import paddlemix_tpu

    rows = {
        "paddlemix_tpu": getattr(paddlemix_tpu, "__version__", "dev"),
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": ", ".join(str(d) for d in jax.devices()),
    }
    try:
        import flax

        rows["flax"] = flax.__version__
    except ImportError:
        pass
    try:
        import torch

        rows["torch"] = torch.__version__
    except ImportError:
        rows["torch"] = "not installed"
    print("paddlemix-tpu environment (copy into bug reports):")
    for k, v in rows.items():
        print(f"- {k}: {v}")
    return 0


def cmd_fp16_safetensors(args) -> int:
    """Re-save weights at reduced precision (reference
    commands/fp16_safetensors.py)."""
    import jax.numpy as jnp
    import numpy as np
    from safetensors import safe_open
    from safetensors.numpy import save_file

    dtype = {"fp16": np.float16, "bf16": jnp.bfloat16.dtype,
             "fp32": np.float32}[args.dtype]
    src = args.path
    files = [f for f in os.listdir(src) if f.endswith(".safetensors")]
    if not files:
        print(f"no .safetensors files under {src}", file=sys.stderr)
        return 1
    out_dir = args.output or src
    os.makedirs(out_dir, exist_ok=True)
    for f in files:
        tensors = {}
        with safe_open(os.path.join(src, f), framework="numpy") as fh:
            for k in fh.keys():
                t = fh.get_tensor(k)
                tensors[k] = t.astype(dtype) if np.issubdtype(
                    t.dtype, np.floating) else t
        out = os.path.join(out_dir, f if args.output else
                           f.replace(".safetensors", f".{args.dtype}.safetensors"))
        save_file(tensors, out)
        print(f"wrote {out} ({len(tensors)} tensors, {args.dtype})")
    return 0


def cmd_convert(args) -> int:
    """Torch checkpoint -> native checkpoint via the model's key map."""
    import importlib

    mod_name, _, cls_name = args.model_class.rpartition(".")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    model = cls.from_pretrained(args.path)
    model.save_pretrained(args.output)
    print(f"converted {args.path} -> {args.output} via {cls.__name__}")
    return 0


def cmd_convert_pipeline(args) -> int:
    """Diffusers/torch pipeline dir (or single-file ckpt) -> native pipeline.

    Replaces the reference's per-family converter scripts
    (ppdiffusers/scripts/convert_diffusers_model/convert_diffusers_*.py):
    `DiffusionPipeline.from_pretrained` already performs the torch->flax
    weight conversion through each component's torch_key_map, so converting
    any family is load + save."""
    import jax.numpy as jnp

    dtype = {"fp32": jnp.float32, "bf16": jnp.bfloat16,
             "fp16": jnp.float16}[args.dtype]
    if os.path.isfile(args.src):  # single-file LDM checkpoint
        from .diffusers import load_pipeline_from_single_file

        pipe = load_pipeline_from_single_file(args.src, dtype=dtype)
    else:
        from .diffusers import DiffusionPipeline

        pipe = DiffusionPipeline.from_pretrained(args.src, dtype=dtype)
    pipe.save_pretrained(args.output)
    print(f"converted {args.src} -> {args.output} "
          f"({type(pipe).__name__}, {args.dtype})")
    return 0


def cmd_merge_lora(args) -> int:
    """Fold a LoRA adapter into base weights and save the merged model
    (reference paddlemix/tools/merge_lora_params.py)."""
    import importlib

    from .peft import load_lora, merge_lora_into_model

    mod_name, _, cls_name = args.model_class.rpartition(".")
    cls = getattr(importlib.import_module(mod_name), cls_name)
    model = cls.from_pretrained(args.model_name_or_path)
    lora_params, lora_config = load_lora(args.lora_path)
    merge_lora_into_model(model, lora_params, lora_config)
    model.save_pretrained(args.output)
    print(f"merged {args.lora_path} into {args.model_name_or_path} "
          f"-> {args.output}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser("paddlemix-tpu-cli")
    sub = parser.add_subparsers(dest="command", required=True)

    sub.add_parser("env", help="print environment info")

    p = sub.add_parser("fp16-safetensors", help="re-save weights in fp16/bf16")
    p.add_argument("path")
    p.add_argument("--dtype", choices=["fp16", "bf16", "fp32"], default="fp16")
    p.add_argument("--output", default=None)

    p = sub.add_parser("convert", help="torch checkpoint -> native")
    p.add_argument("path")
    p.add_argument("output")
    p.add_argument("--model-class", required=True,
                   help="e.g. paddlemix_tpu.models.llama.LlamaForCausalLM")

    p = sub.add_parser("convert-pipeline", help="diffusers pipeline dir or "
                       "single-file ckpt -> native pipeline dir")
    p.add_argument("src")
    p.add_argument("output")
    p.add_argument("--dtype", choices=["fp32", "bf16", "fp16"], default="fp32")

    p = sub.add_parser("merge-lora", help="fold a LoRA adapter into base "
                       "weights (reference tools/merge_lora_params.py)")
    p.add_argument("model_name_or_path")
    p.add_argument("lora_path")
    p.add_argument("output")
    p.add_argument("--model-class", required=True,
                   help="e.g. paddlemix_tpu.models.llama.LlamaForCausalLM")

    args = parser.parse_args(argv)
    return {"env": cmd_env, "fp16-safetensors": cmd_fp16_safetensors,
            "convert": cmd_convert,
            "convert-pipeline": cmd_convert_pipeline,
            "merge-lora": cmd_merge_lora}[args.command](args)


if __name__ == "__main__":
    raise SystemExit(main())
