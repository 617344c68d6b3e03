"""Same-process A/B: LLaVA-7B a8w8 decode across trunk configs
(fused_qkv / scan_layers).

Decode ms/token = (total - ttft) / (new_tokens - 1), host-fenced.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.models.llava import LlavaConfig, LlavaForConditionalGeneration


def constant_fill(shapes):
    def fill(l):
        if l.dtype == jnp.int8:
            return jnp.full(l.shape, 23, jnp.int8)
        if l.ndim == 1 and l.dtype == jnp.float32:
            return jnp.full(l.shape, 2e-4, jnp.float32)
        return jnp.full(l.shape, 0.02, l.dtype)
    return jax.jit(lambda: jax.tree_util.tree_map(fill, shapes))()


def run_arm(fused, scan=False, kv_int8=False, new_tokens=128):
    cfg = LlavaConfig(
        vision_config=dict(hidden_size=1024, intermediate_size=4096,
                           num_hidden_layers=24, num_attention_heads=16,
                           image_size=336, patch_size=14, projection_dim=768),
        text_config=dict(vocab_size=32000, hidden_size=4096,
                         intermediate_size=11008, num_hidden_layers=32,
                         num_attention_heads=32, num_key_value_heads=32,
                         max_position_embeddings=4096, quant="a8w8",
                         fused_qkv=fused, scan_layers=scan,
                         cachekv_int8=kv_int8),
    )
    model = LlavaForConditionalGeneration(cfg, dtype=jnp.bfloat16)
    args, kwargs = LlavaForConditionalGeneration.example_inputs(cfg)
    shapes = jax.eval_shape(
        lambda: model.module.init(jax.random.PRNGKey(0), *args, **kwargs))["params"]
    model.params = constant_fill(shapes)

    n_img = cfg.num_image_tokens
    ids = np.full((1, n_img + 32), 5, np.int32)
    ids[:, 1:1 + n_img] = cfg.image_token_index
    ids = jnp.asarray(ids)
    px = jnp.zeros((1, 336, 336, 3), jnp.float32)

    def run(n):
        out = model.generate(ids, pixel_values=px, max_new_tokens=n,
                             eos_token_id=-1)
        np.asarray(out)

    t0 = time.time(); run(1); c1 = time.time() - t0
    t0 = time.time(); run(new_tokens); c2 = time.time() - t0
    print(f"# fused={fused} scan={scan} kv_int8={kv_int8} "
          f"compiles {c1:.0f}s + {c2:.0f}s", flush=True)

    def med(n, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.time(); run(n); ts.append(time.time() - t0)
        return float(np.median(ts))

    ttft = med(1)
    total = med(new_tokens)
    ms_tok = (total - ttft) / (new_tokens - 1) * 1e3
    print(json.dumps({"fused": fused, "scan": scan, "kv_int8": kv_int8,
                      "ms_per_token": round(ms_tok, 3),
                      "tok_s": round(1e3 / ms_tok, 1),
                      "ttft_ms": round(ttft * 1e3, 1)}), flush=True)
    # free arena for the next arm
    del model
    return ms_tok


if __name__ == "__main__":
    import sys

    # NOTE: scan_layers requires the dense bf16 KV cache (modeling.py), so
    # scan+kv arms are invalid by construction
    arms = sys.argv[1:] or ["base", "fused", "scan", "fused+scan", "kv",
                            "fused+kv"]
    results = {}
    for arm in arms:
        results[arm] = run_arm("fused" in arm, scan="scan" in arm,
                               kv_int8="kv" in arm)
    base = results.get("base")
    if base:
        for arm, v in results.items():
            print(f"# {arm}: {base / v:.3f}x vs base", flush=True)
