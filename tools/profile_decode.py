"""Per-op profile of the Llama-7B decode step (the LLaVA serving path).

Builds the 7B text trunk with a8w8/wint8/bf16 MXUDense, runs a fixed
number of cached decode steps under jax.profiler.trace, and aggregates
the device "XLA Ops" line per step (same xplane parsing as
profile_sdxl.py — the tensorboard converter is broken in this image).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_decode.py \
        [a8w8|wint8|bf16] [ctx_len]
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    quant = sys.argv[1] if len(sys.argv) > 1 else "a8w8"
    ctx = int(sys.argv[2]) if len(sys.argv) > 2 else 704
    steps = int(os.environ.get("PROFILE_STEPS", 8))
    if quant in ("bf16", "none"):
        quant = None

    from paddlemix_tpu.models.llama.modeling import (
        KVCache,
        LlamaConfig,
        LlamaForCausalLM,
    )

    cfg = LlamaConfig(vocab_size=32000, hidden_size=4096,
                      intermediate_size=11008, num_hidden_layers=32,
                      num_attention_heads=32, num_key_value_heads=32,
                      max_position_embeddings=4096, quant=quant,
                      fused_qkv=os.environ.get("PROFILE_FUSED", "0") == "1")
    model = LlamaForCausalLM(cfg, dtype=jnp.bfloat16)
    args, kwargs = LlamaForCausalLM.example_inputs(cfg)
    shapes = jax.eval_shape(
        lambda: model.module.init(jax.random.PRNGKey(0), *args, **kwargs))["params"]

    def fill(l):
        if l.dtype == jnp.int8:
            return jnp.full(l.shape, 23, jnp.int8)
        if l.ndim == 1 and l.dtype == jnp.float32:
            return jnp.full(l.shape, 2e-4, jnp.float32)
        return jnp.full(l.shape, 0.02, l.dtype)

    params = jax.jit(lambda: jax.tree_util.tree_map(fill, shapes))()
    model.params = params

    cache = KVCache.create(cfg, 1, ctx + steps + 8)
    # pretend ctx tokens are already in the cache
    cache = cache._replace(lengths=jnp.full_like(cache.lengths, ctx))

    @jax.jit
    def decode_step(params, token, pos, ck, cv, lengths):
        logits, new = model.module.apply(
            {"params": params}, token, pos,
            cache=KVCache(ck, cv, lengths))
        nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        return nxt, new.k, new.v, new.lengths

    token = jnp.full((1, 1), 5, jnp.int32)
    pos = jnp.full((1, 1), ctx, jnp.int32)
    mode = os.environ.get("PROFILE_MODE", "generate")
    if mode == "generate":
        # the REAL serving path: jitted while_loop with the cache in the
        # carry (in-place updates), exactly what bench llava measures
        from paddlemix_tpu.models.llama.modeling import greedy_generate

        ids = jnp.full((1, ctx), 5, jnp.int32)

        def run(n):
            out = greedy_generate(model, ids, max_new_tokens=n,
                                  eos_token_id=-1)
            np.asarray(out)

        t0 = time.time()
        run(1)
        print(f"# compile(prefill+1) {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        run(1 + steps)
        print(f"# compile(+{steps}) {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        run(1)
        ttft = time.time() - t0
        t0 = time.time()
        run(1 + steps)
        wall = (time.time() - t0 - ttft) / steps
        print(f"# wall {wall*1e3:.2f} ms/token ({1/wall:.1f} tok/s) "
              f"ttft={ttft*1e3:.0f}ms", flush=True)
        if os.environ.get("PROFILE_TRACE", "1") == "0":
            return
        trace_dir = "/tmp/decode_trace"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            run(1 + steps)
        steps += 1  # prefill rides in the same trace; report per-iteration
    else:
        t0 = time.time()
        token2, ck, cv, lg = decode_step(params, token, pos, cache.k, cache.v,
                                         cache.lengths)
        np.asarray(token2)
        print(f"# compile {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        tk, ck_, cv_, lg_ = token2, ck, cv, lg
        for i in range(steps):
            tk, ck_, cv_, lg_ = decode_step(params, tk, pos + 1 + i, ck_, cv_, lg_)
        np.asarray(tk)
        wall = (time.time() - t0) / steps
        print(f"# wall {wall*1e3:.2f} ms/token ({1/wall:.1f} tok/s)", flush=True)
        trace_dir = "/tmp/decode_trace"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            tk2, ck2, cv2, lg2 = token2, ck, cv, lg
            for i in range(steps):
                tk2, ck2, cv2, lg2 = decode_step(params, tk2, pos + 1 + i,
                                                 ck2, cv2, lg2)
            np.asarray(tk2)
    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_sdxl import summarize_xplane

    summarize_xplane(paths[0], steps=steps, top=30)


if __name__ == "__main__":
    main()
