"""Kernel-layer tests: Pallas (interpret mode) vs XLA reference, values + grads.

Mirrors the reference's native-op grad-check strategy
(groundingdino/csrc/test_ms_deformable_attn_op.py: CUDA op vs python ref)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import paddlemix_tpu.ops as ops
from paddlemix_tpu.ops.attention import SegmentIds, attention_xla, flash_attention
from paddlemix_tpu.ops.norms import (
    adaptive_layer_norm_xla,
    fused_adaln_scale_residual_xla,
    layer_norm_xla,
    rms_norm_xla,
)
from paddlemix_tpu.ops.quant import quantize_weights_int8, wint8_matmul, wint8_matmul_xla


@pytest.fixture(autouse=True)
def pallas_interpret(monkeypatch):
    monkeypatch.setenv("PMIX_KERNEL_BACKEND", "pallas")
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")


def rand(*shape, key=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


# ------------------------------------------------------------------ norms
def test_rms_norm_matches_xla_and_grads():
    x = rand(4, 64, 256)
    w = rand(256, key=1) * 0.1 + 1.0
    y_p = ops.rms_norm(x, w)
    y_x = rms_norm_xla(x, w)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=1e-5)

    def loss_p(x, w):
        return jnp.sum(ops.rms_norm(x, w) ** 2)

    def loss_x(x, w):
        return jnp.sum(rms_norm_xla(x, w) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gx = jax.grad(loss_x, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), atol=1e-3)


def test_norms_decode_shapes_match(monkeypatch):
    # below the Pallas row threshold (decode shapes) the public entry points
    # take the XLA composition — outputs must stay identical either way.
    # Assert the DISPATCH too: the Pallas kernels must not be invoked for
    # sub-threshold rows (a regression back to Pallas adds launch latency to
    # every norm on the latency-bound decode path).
    from paddlemix_tpu.ops import norms as norms_mod

    def _boom(*a, **k):
        raise AssertionError("Pallas norm invoked for sub-threshold rows")

    monkeypatch.setattr(norms_mod, "_rms_norm_pallas", _boom)
    monkeypatch.setattr(norms_mod, "_layer_norm_pallas", _boom)
    monkeypatch.setattr(norms_mod, "_adaln_pallas", _boom)
    monkeypatch.setattr(norms_mod, "_fused_adaln_pallas", _boom)
    x = rand(1, 1, 4096)
    w = rand(4096, key=1) * 0.1 + 1.0
    b = rand(4096, key=2) * 0.1
    np.testing.assert_allclose(
        np.asarray(ops.rms_norm(x, w)), np.asarray(rms_norm_xla(x, w)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ops.layer_norm(x, w, b)),
        np.asarray(layer_norm_xla(x, w, b)), atol=1e-5)
    # adaln entry points also honor the threshold (ADVICE r3: their guard was
    # vacuous when rows defaulted)
    sc = rand(1, 4096, key=3) * 0.1
    sh = rand(1, 4096, key=4) * 0.1
    ops.adaptive_layer_norm(x, sc, sh)
    ops.fused_adaln_scale_residual(x, x, sc, sc, sh)


def test_layer_norm_matches_xla_and_grads():
    x = rand(8, 128)
    w = rand(128, key=1) * 0.1 + 1.0
    b = rand(128, key=2) * 0.1
    y_p = ops.layer_norm(x, w, b)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(layer_norm_xla(x, w, b)), atol=1e-5)

    gp = jax.grad(lambda x, w, b: jnp.sum(ops.layer_norm(x, w, b) ** 2), argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(lambda x, w, b: jnp.sum(layer_norm_xla(x, w, b) ** 2), argnums=(0, 1, 2))(x, w, b)
    for a, bq in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bq), atol=1e-4)


def test_adaln_and_fused_residual():
    x = rand(2, 16, 128)
    scale = rand(2, 128, key=1) * 0.1
    shift = rand(2, 128, key=2) * 0.1
    y = ops.adaptive_layer_norm(x, scale, shift)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(adaptive_layer_norm_xla(x, scale, shift)), atol=1e-5
    )
    gate = rand(2, 128, key=3) * 0.1
    resi = rand(2, 16, 128, key=4)
    y2, resi_out = ops.fused_adaln_scale_residual(resi, x, gate, scale, shift)
    y2_ref, resi_ref = fused_adaln_scale_residual_xla(resi, x, gate, scale, shift)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(resi_out), np.asarray(resi_ref), atol=1e-6)
    # grads flow (XLA-recompute bwd)
    g = jax.grad(lambda x: jnp.sum(ops.adaptive_layer_norm(x, scale, shift) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(adaptive_layer_norm_xla(x, scale, shift) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


# ------------------------------------------------------------------ attention
@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_math(causal):
    b, s, h, d = 1, 256, 2, 128
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)
    o_f = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    o_m = attention_xla(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_m), atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_int8_qk(causal):
    """int8 QK^T path (PMIX_INT8_ATTN / int8_qk=True): per-row dynamic
    scales keep the softmax output within int8 logit error of the math
    path. D=64 on purpose — the shape whose bf16 contraction idles half
    the MXU, which is what this path exists to fix."""
    b, s, h, d = 1, 256, 2, 64
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)
    o_f = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128,
                          int8_qk=True)
    o_m = attention_xla(q, k, v, causal=causal)
    # int8 logits -> softmax output error ~1e-2 abs worst-element; causal is
    # the worst case (few-key rows don't average the logit error out). Well
    # below the quant noise of the surrounding a8w8 matmuls either way.
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_m),
                               atol=2.5e-2 if causal else 1e-2)
    # and a GQA + segments combination through the same path
    q4 = rand(b, s, 4, d, key=3)
    seg = SegmentIds(jnp.ones((b, s), jnp.int32), jnp.ones((b, s), jnp.int32))
    o_g = flash_attention(q4, k, v, segment_ids=seg, block_q=128, block_k=128,
                          int8_qk=True)
    o_gm = attention_xla(q4, k, v, segment_ids=seg)
    np.testing.assert_allclose(np.asarray(o_g), np.asarray(o_gm), atol=1e-2)


def test_flash_attention_gqa():
    b, s, d = 1, 256, 128
    q = rand(b, s, 4, d)
    k, v = rand(b, s, 2, d, key=1), rand(b, s, 2, d, key=2)
    o_f = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    o_m = attention_xla(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_m), atol=2e-5)


def test_flash_attention_segments_and_padding():
    b, s, h, d = 1, 200, 2, 64  # odd seq -> padding; d=64 -> lane pad
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)
    seg = jnp.concatenate([jnp.zeros((b, 100), jnp.int32), jnp.ones((b, 100), jnp.int32)], axis=1)
    ids = SegmentIds(seg, seg)
    o_f = flash_attention(q, k, v, segment_ids=ids, block_q=128, block_k=128)
    o_m = attention_xla(q, k, v, segment_ids=ids)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_m), atol=2e-5)


def test_flash_attention_wide_head():
    """d=512 single head (VAE mid-block shape): flash must match math — the
    SDPA auto path routes it to the kernel with shrunken blocks."""
    b, s, h, d = 1, 256, 1, 512
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)
    o_f = flash_attention(q, k, v)
    o_m = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_m), atol=2e-5)

    from paddlemix_tpu.ops import scaled_dot_product_attention
    o_auto = scaled_dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(o_auto), np.asarray(o_m), atol=2e-5)


def test_flash_attention_inference_matches_grad_path():
    """The no-lse inference kernel and the lse-producing fwd used under
    jax.grad must produce identical outputs."""
    b, s, h, d = 1, 256, 2, 64
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)
    o_inf = flash_attention(q, k, v, block_q=128, block_k=128)

    # value_and_grad routes through the custom_vjp fwd rule (want_lse=True)
    def f(q):
        return flash_attention(q, k, v, block_q=128, block_k=128)

    o_grad, _ = jax.vjp(f, q)
    np.testing.assert_allclose(np.asarray(o_inf), np.asarray(o_grad), atol=1e-6)


def test_flash_attention_grads():
    b, s, h, d = 1, 256, 2, 128
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)

    def loss_f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, block_q=128, block_k=128) ** 2)

    def loss_m(q, k, v):
        return jnp.sum(attention_xla(q, k, v, causal=True) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gm = jax.grad(loss_m, argnums=(0, 1, 2))(q, k, v)
    for a, bq, name in zip(gf, gm, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bq), atol=5e-4, err_msg=f"d{name}")


def test_flash_attention_gqa_grads():
    b, s, d = 1, 128, 128
    q = rand(b, s, 4, d)
    k, v = rand(b, s, 2, d, key=1), rand(b, s, 2, d, key=2)
    gf = jax.grad(lambda k: jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128) ** 2))(k)
    gm = jax.grad(lambda k: jnp.sum(attention_xla(q, k, v) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gm), atol=5e-4)


def test_sdpa_dispatch_math_path():
    # bias forces math path
    b, s, h, d = 1, 32, 2, 16
    q, k, v = rand(b, s, h, d), rand(b, s, h, d, key=1), rand(b, s, h, d, key=2)
    bias = rand(b, h, s, s, key=3)
    out = ops.scaled_dot_product_attention(q, k, v, bias=bias)
    assert out.shape == q.shape


# ------------------------------------------------------------------ rope
def test_rope_roundtrip():
    b, s, h, d = 2, 16, 2, 64
    q, k = rand(b, s, h, d), rand(b, s, h, d, key=1)
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    cos, sin = ops.rope_cos_sin(pos, d)
    q1, k1 = ops.apply_rope(q, k, cos, sin)
    assert q1.shape == q.shape
    # rotation preserves norms pairwise
    np.testing.assert_allclose(
        np.asarray(jnp.sum(q1**2, axis=-1)), np.asarray(jnp.sum(q**2, axis=-1)), rtol=1e-5
    )
    # position 0 is identity
    np.testing.assert_allclose(np.asarray(q1[:, 0]), np.asarray(q[:, 0]), atol=1e-6)


def test_mrope_sections():
    d = 64
    sections = (8, 12, 12)  # sums to 32 = d//2
    pos = jnp.zeros((3, 2, 10), jnp.int32)
    cos, sin = ops.mrope_cos_sin(pos, d, sections)
    assert cos.shape == (2, 10, d)
    np.testing.assert_allclose(np.asarray(cos), 1.0)


# ------------------------------------------------------------------ quant
def test_wint8_matmul():
    x = rand(16, 256)
    w = rand(256, 384, key=1) * 0.05
    wq, scale = quantize_weights_int8(w)
    y_ref = jnp.dot(x, w)
    y_x = wint8_matmul_xla(x, wq, scale)
    y_p = wint8_matmul(x, wq, scale, block_m=8, block_n=128, block_k=128)
    # quantization error bounded, pallas matches xla dequant closely
    assert float(jnp.max(jnp.abs(y_x - y_ref))) < 0.15
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=2e-2)


def test_int4_pack_unpack_roundtrip():
    """quantize_weights_int4 packs two rows per byte; unpack_int4 must
    restore the exact int4 values (S4) and the dequantized matmul must stay
    within the per-channel int4 quantization error bound."""
    from paddlemix_tpu.ops.quant import quantize_weights_int4, unpack_int4

    w = rand(256, 384, key=2) * 0.05
    packed, scale = quantize_weights_int4(w)
    assert packed.shape == (128, 384) and packed.dtype == jnp.int8
    w4 = unpack_int4(packed)
    assert w4.shape == (256, 384)
    # exact nibble roundtrip vs direct requantization
    q_ref = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(w4.astype(jnp.int32)),
                                  np.asarray(q_ref))
    # dequant error bound: |w - q*s| <= s/2 per element
    err = jnp.abs(w4.astype(jnp.float32) * scale - w)
    assert float(jnp.max(err - scale / 2)) < 1e-6


def test_activations_registry():
    x = rand(4, 8)
    for name in ("gelu", "quick_gelu", "silu", "relu", "mish"):
        y = ops.get_activation(name)(x)
        assert y.shape == x.shape
    with pytest.raises(KeyError):
        ops.get_activation("nope")


# ------------------------------------------------------------------ ms_deform_attn
def test_ms_deform_attn_matches_numpy_reference():
    """XLA gather/interp op vs a direct numpy implementation (mirrors the
    reference CUDA-op grad-check test, csrc/test_ms_deformable_attn_op.py)."""
    from paddlemix_tpu.ops import ms_deform_attn

    rng = np.random.RandomState(0)
    B, H, D, Q, P = 2, 2, 4, 3, 2
    shapes = [(4, 6), (2, 3)]
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, H, D).astype(np.float32)
    locs = rng.rand(B, Q, H, len(shapes), P, 2).astype(np.float32) * 0.8 + 0.1
    weights = rng.rand(B, Q, H, len(shapes), P).astype(np.float32)
    weights /= weights.sum(axis=(3, 4), keepdims=True)

    out = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(locs), jnp.asarray(weights)))

    # numpy reference
    ref = np.zeros((B, Q, H, D), np.float32)
    offset = 0
    for lvl, (h, w) in enumerate(shapes):
        vl = value[:, offset: offset + h * w].reshape(B, h, w, H, D)
        offset += h * w
        for b in range(B):
            for q in range(Q):
                for hh in range(H):
                    for p in range(P):
                        x = locs[b, q, hh, lvl, p, 0] * w - 0.5
                        y = locs[b, q, hh, lvl, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        dx, dy = x - x0, y - y0
                        acc = np.zeros(D, np.float32)
                        for (yy, xx, ww) in ((y0, x0, (1-dy)*(1-dx)), (y0, x0+1, (1-dy)*dx),
                                             (y0+1, x0, dy*(1-dx)), (y0+1, x0+1, dy*dx)):
                            if 0 <= xx < w and 0 <= yy < h:
                                acc += ww * vl[b, yy, xx, hh]
                        ref[b, q, hh] += acc * weights[b, q, hh, lvl, p]
    np.testing.assert_allclose(out, ref.reshape(B, Q, H * D), atol=1e-5)

    # gradients flow through value and locations
    g = jax.grad(lambda v: jnp.sum(ms_deform_attn(v, shapes, jnp.asarray(locs),
                                                  jnp.asarray(weights)) ** 2))(jnp.asarray(value))
    assert float(jnp.abs(g).sum()) > 0


# ------------------------------------------------------------------ decode attention
def test_decode_attention_matches_xla():
    from paddlemix_tpu.ops.decode_attention import decode_attention, decode_attention_xla

    b, L, hq, kvh, d = 2, 256, 4, 2, 128
    q = rand(b, 1, hq, d)
    k = rand(b, L, kvh, d, key=1)
    v = rand(b, L, kvh, d, key=2)
    lengths = jnp.asarray([100, 256], jnp.int32)
    out_p = decode_attention(q, k, v, lengths, block_k=128)
    out_x = decode_attention_xla(q, k, v, lengths)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-5)
    # short lengths actually mask: changing masked kv must not change output
    k2 = k.at[0, 200].set(99.0)
    out_p2 = decode_attention(q, k2, v, lengths, block_k=128)
    np.testing.assert_allclose(np.asarray(out_p2[0]), np.asarray(out_p[0]), atol=1e-6)


# ------------------------------------------------------------------ ToMe
def test_tome_merge_unmerge():
    from paddlemix_tpu.ops.tome import build_tome

    b, gh, gw, c = 2, 8, 8, 16
    x = rand(b, gh * gw, c)
    merge, unmerge = build_tome(x, gh, gw, ratio=0.25)
    merged = merge(x)
    assert merged.shape[1] == gh * gw - 16  # 25% merged
    restored = unmerge(merged)
    assert restored.shape == x.shape
    # kept tokens round-trip exactly through merge->unmerge when values pass
    # through unchanged; merged tokens take their destination's value
    diff = jnp.abs(restored - x).max(axis=-1)  # (B, N)
    n_changed = int((diff[0] > 1e-5).sum())
    assert n_changed <= 16 + 16  # merged sources + averaged destinations
    # ratio 0 -> identity
    m0, u0 = build_tome(x, gh, gw, ratio=0.0)
    np.testing.assert_allclose(np.asarray(u0(m0(x))), np.asarray(x))


def test_decode_attention_int8(pallas_interpret):
    """int8-cache fused decode kernel vs the dequantized XLA reference."""
    from paddlemix_tpu.ops.decode_attention import (
        decode_attention_int8,
        decode_attention_xla,
    )

    b, L, hq, kvh, d = 2, 256, 4, 2, 64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    q = jax.random.normal(ks[0], (b, 1, hq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, L, kvh, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, L, kvh, d), jnp.float32)
    lengths = jnp.asarray([100, 256], jnp.int32)

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1)
        s = jnp.maximum(amax / 127.0, 1e-8)
        return jnp.clip(jnp.round(x / s[..., None]), -127, 127).astype(jnp.int8), s

    kq, ksc = quant(k)
    vq, vsc = quant(v)
    kd = kq.astype(jnp.float32) * ksc[..., None]
    vd = vq.astype(jnp.float32) * vsc[..., None]
    ref = decode_attention_xla(q, kd, vd, lengths)
    out = decode_attention_int8(q, kq, vq, ksc, vsc, lengths, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)
