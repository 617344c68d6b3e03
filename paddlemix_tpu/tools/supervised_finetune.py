"""Unified SFT entry point.

Rebuild of the reference CLI (paddlemix/tools/supervised_finetune.py:36-199:
PdMIXArgumentParser over a JSON config, AutoModel + freeze + LoRA + MixToken +
Trainer + resume). Usage:

  python -m paddlemix_tpu.tools.supervised_finetune config.json

Config keys: model_name_or_path, dataset_path (jsonl with input_ids/labels or
conversations), max_length, lora (bool) + lora_r/lora_alpha, freeze_include/
freeze_exclude, mixtoken (bool), plus any TrainingArguments field."""

from __future__ import annotations

import dataclasses
import json
import re
import sys
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..auto import AutoModel
from ..core.modeling import enable_recompute
from ..datasets import DataLoader, MapDataset, MixTokenMapDataset, load_dataset, pad_collate
from ..models.llava import llava_loss
from ..ops.attention import SegmentIds
from ..peft import LoraConfig, lora_init, lora_loss_fn, save_lora
from ..trainer import Trainer, TrainingArguments
from ..utils.log import logger


def freeze_params(params, include: Optional[str] = None, exclude: Optional[str] = None):
    """Build an optax-style trainable mask (reference trainer/freeze_utils.py:
    freeze by name patterns). include = regex of params to FREEZE."""
    import optax
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        name = ".".join(str(p) for p in path)
        frozen = bool(include and re.search(include, name))
        if exclude and re.search(exclude, name):
            frozen = False
        mask[path] = not frozen
    return traverse_util.unflatten_dict(mask)


def default_lm_loss(model):
    def loss_fn(params, batch, rng):
        seg = None
        positions = None
        if "segment_ids" in batch:
            seg = SegmentIds(batch["segment_ids"], batch["segment_ids"])
            positions = batch.get("positions")
        logits, _ = model.module.apply({"params": params}, batch["input_ids"], positions,
                                       segment_ids=seg)
        return llava_loss(logits, batch["labels"])

    return loss_fn


def main(config_path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None):
    if config_path is None:
        config_path = sys.argv[1]
    with open(config_path) as f:
        cfg = json.load(f)
    cfg.update(overrides or {})

    model = AutoModel.from_pretrained(cfg["model_name_or_path"],
                                      dtype=jnp.bfloat16 if cfg.get("bf16", True) else jnp.float32)
    if cfg.get("recompute") or cfg.get("gradient_checkpointing"):
        # reference configs' "recompute": true (e.g.
        # paddlemix/config/llava/*.json) -> per-layer remat
        enable_recompute(model)
    dataset = load_dataset(cfg["dataset_path"])
    max_length = int(cfg.get("max_length", 2048))
    if cfg.get("mixtoken", True):
        dataset = MixTokenMapDataset(dataset, max_length,
                                     pad_token_id=int(cfg.get("pad_token_id", 0)))
        logger.info("MixToken packing: %d packed rows", len(dataset))

    ta_fields = {f.name for f in dataclasses.fields(TrainingArguments)}
    unknown = {k for k in cfg if k not in ta_fields and k not in (
        "model_name_or_path", "dataset_path", "max_length", "mixtoken",
        "pad_token_id", "lora", "lora_r", "lora_rank", "lora_alpha",
        "freeze", "freeze_include", "freeze_exclude", "warmup_ratio",
        "benchmark", "per_device_train_batch_size", "recompute",
        "gradient_checkpointing")}
    if unknown:
        logger.warning("ignoring unknown config keys: %s", sorted(unknown))
    args = TrainingArguments.from_dict({k: v for k, v in cfg.items() if k in ta_fields})
    if cfg.get("warmup_ratio") and not cfg.get("warmup_steps"):
        # resolved against max_steps when known; else a sane default horizon
        horizon = args.max_steps if getattr(args, "max_steps", 0) else 1000
        args.warmup_steps = int(float(cfg["warmup_ratio"]) * horizon)
    loader = DataLoader(dataset, batch_size=int(cfg.get("per_device_train_batch_size", 8)),
                        collate_fn=pad_collate, shuffle=True, seed=args.seed)

    loss_fn = default_lm_loss(model)
    if getattr(args, "pipeline_parallel_degree", 1) > 1:
        # PP pass-through (reference blip2_trainer.py:306-354 fleet pp wrap):
        # the Llama trunk runs as a GPipe pipeline over the stage mesh axis
        from ..models.llama.modeling import LlamaForCausalLM
        from ..models.llama.pipeline import make_llama_pipeline_loss

        target = model
        if not isinstance(target, LlamaForCausalLM):
            raise ValueError(
                "pipeline_parallel_degree > 1 is wired for Llama-family "
                f"causal LMs; got {type(model).__name__}")
        loss_fn = make_llama_pipeline_loss(
            target, num_microbatches=int(cfg.get("pp_num_microbatches", 4)))
    if cfg.get("lora"):
        lcfg = LoraConfig(r=int(cfg.get("lora_r", cfg.get("lora_rank", 8))),
                          lora_alpha=int(cfg.get("lora_alpha", 16)))
        lora = lora_init(model.params, lcfg, jax.random.PRNGKey(args.seed))
        trainer = Trainer(params=lora, args=args,
                          loss_fn=lora_loss_fn(loss_fn, model.params, lcfg),
                          train_dataloader=loader)
        result = trainer.train()
        save_lora(trainer.state.params, lcfg, f"{args.output_dir}/lora")
        logger.info("saved LoRA adapters to %s/lora", args.output_dir)
    else:
        trainer = Trainer(model=model, args=args, loss_fn=loss_fn, train_dataloader=loader)
        result = trainer.train()
        model.params = jax.device_get(trainer.state.params)
        model.save_pretrained(f"{args.output_dir}/final")
        logger.info("saved model to %s/final", args.output_dir)
    return result


if __name__ == "__main__":
    main()
