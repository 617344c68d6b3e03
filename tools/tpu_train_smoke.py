"""TPU training-step smoke: run ONE compiled training step on the real chip.

Gates what the CPU test suite cannot (round-1 verdict W6): the Pallas flash
attention dkv/dq backward and fused-norm backward kernels compiling through
Mosaic and executing on hardware (the suite runs them in interpret mode).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_train_smoke.py
Prints one JSON line {"ok": true, ...} on success.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert os.environ.get("PMIX_PALLAS_INTERPRET", "0") != "1", \
        "interpret mode would defeat the purpose of this smoke"
    from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from paddlemix_tpu.models.llava import llava_loss
    from paddlemix_tpu.ops.dispatch import use_pallas

    backend = jax.default_backend()
    pallas_on = use_pallas()
    # big enough that the flash kernel (not the XLA fallback) handles it:
    # S=512 >= the kernel's min block, D=64 exercises the unpadded head path
    cfg = LlamaConfig(vocab_size=512, hidden_size=512, intermediate_size=1024,
                      num_hidden_layers=2, num_attention_heads=8,
                      num_key_value_heads=4, max_position_embeddings=512)
    model = LlamaForCausalLM.from_config(cfg, dtype=jnp.bfloat16, seed=0)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 512), 3, 512, jnp.int32)
    labels = jnp.roll(ids, -1, axis=1)

    def loss_fn(params):
        logits, _ = model.module.apply({"params": params}, ids)
        return llava_loss(logits, labels)

    t0 = time.time()
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(model.params)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                         for g in jax.tree_util.tree_leaves(grads)))
    loss_f, gnorm_f = float(loss), float(gnorm)
    compile_s = time.time() - t0
    ok = bool(np.isfinite(loss_f) and np.isfinite(gnorm_f) and gnorm_f > 0)
    print(json.dumps({"ok": ok, "backend": backend, "pallas": bool(pallas_on),
                      "loss": round(loss_f, 4), "grad_norm": round(gnorm_f, 4),
                      "compile_s": round(compile_s, 1)}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
