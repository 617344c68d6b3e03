"""Qwen2-VL static predictor.

TPU counterpart of the reference's deploy/qwen2_vl static predict: the
serving process loads the AOT-exported prefill/decode computations and runs
the generation loop host-side — no tracing. During decode t=h=w, so a
single scalar M-RoPE position per sample broadcast over the 3 streams
matches the model's generate().

Usage:
  python deploy/qwen2_vl/predict.py --export-dir ./qwen2vl_export \
      --image img.jpg --prompt "describe" --max-new-tokens 32
  # tokenizer-free smoke: --ids "1,5,9"
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--export-dir", required=True)
    ap.add_argument("--image", default=None)
    ap.add_argument("--prompt", default=None)
    ap.add_argument("--ids", default=None)
    ap.add_argument("--max-new-tokens", type=int, default=16)
    ap.add_argument("--eos", type=int, default=-1)
    args = ap.parse_args()

    import jax.numpy as jnp

    from paddlemix_tpu.deploy import load_fn
    from paddlemix_tpu.models.qwen2_vl import Qwen2VLForConditionalGeneration

    model = Qwen2VLForConditionalGeneration.from_pretrained(args.export_dir)
    prefill = load_fn(os.path.join(args.export_dir, "prefill.jaxexport"))
    decode = load_fn(os.path.join(args.export_dir, "decode.jaxexport"))
    cfg = model.config
    v = cfg.vision

    s = int(os.environ.get("QWEN2VL_PROMPT_LEN", 256))
    npatch = int(os.environ.get("QWEN2VL_VISION_PATCHES", 1024))
    max_len = int(os.environ.get("QWEN2VL_MAX_LEN", 4096))
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2

    if args.ids:
        ids_list = [int(t) for t in args.ids.split(",")]
    else:
        from paddlemix_tpu.utils.tokenizer import load_tokenizer

        tok = load_tokenizer(args.export_dir)
        ids_list = tok.encode(args.prompt or "describe the image")

    if args.image:
        from paddlemix_tpu.processors.qwen2_vl_processing import (
            Qwen2VLImageProcessor,
        )

        proc = Qwen2VLImageProcessor()
        from PIL import Image

        enc = proc([np.asarray(Image.open(args.image).convert("RGB"))])
        patches = np.zeros((1, npatch, patch_dim), np.float32)
        pos_hw = np.zeros((1, npatch, 2), np.int32)
        segs = np.zeros((1, npatch), np.int32)
        n = min(enc["pixel_patches"].shape[1], npatch)
        patches[:, :n] = enc["pixel_patches"][:, :n]
        pos_hw[:, :n] = enc["patch_pos_hw"][:, :n]
        segs[:, :n] = 1
        n_tok = n // (cfg.spatial_merge_size ** 2)
        ids_list = ([ids_list[0]] + [cfg.image_token_id] * n_tok
                    + ids_list[1:])
    else:
        patches = np.zeros((1, npatch, patch_dim), np.float32)
        pos_hw = np.zeros((1, npatch, 2), np.int32)
        segs = np.zeros((1, npatch), np.int32)

    ids_list = ids_list[:s]
    n_ids = len(ids_list)
    ids = np.zeros((1, s), np.int32)
    ids[0, :n_ids] = ids_list
    pos3 = np.zeros((3, 1, s), np.int32)
    pos3[:, 0, :n_ids] = np.arange(n_ids)
    write_pos = np.full((1, s), -1, np.int32)
    write_pos[0, :n_ids] = np.arange(n_ids)

    cache = model.init_cache(1, max_len)
    logits, ck, cv, lengths = prefill(
        model.params, jnp.asarray(ids), jnp.asarray(pos3),
        jnp.asarray(patches), jnp.asarray(pos_hw), jnp.asarray(segs),
        jnp.asarray(write_pos), cache.k, cache.v, cache.lengths)
    cur = int(np.argmax(np.asarray(logits)[0, n_ids - 1]))
    out_tokens = [cur]
    rope_pos = n_ids
    for _ in range(args.max_new_tokens - 1):
        if cur == args.eos:
            break
        p3 = np.full((3, 1, 1), rope_pos, np.int32)
        logits, ck, cv, lengths = decode(
            model.params, jnp.asarray([[cur]], jnp.int32), jnp.asarray(p3),
            jnp.asarray([[rope_pos]], jnp.int32), ck, cv, lengths)
        cur = int(np.argmax(np.asarray(logits)[0, -1]))
        out_tokens.append(cur)
        rope_pos += 1

    print("tokens:", out_tokens)


if __name__ == "__main__":
    main()
