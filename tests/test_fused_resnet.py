"""Parity tests for the fused GN+SiLU+int8-conv3x3 kernel (interpret mode).

The Pallas kernel must reproduce the XLA reference composition that performs
IDENTICAL quantization math (fused_gn_silu_conv3x3_ref) bit-closely: the only
differences are fp32 accumulation order in the moments and the dequant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from paddlemix_tpu.ops.fused_resnet import (
    fused_gn_silu_conv3x3,
    fused_gn_silu_conv3x3_ref,
    fused_supported,
)


def _mk(b, h, w, c, o, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 6)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32) * 0.8
    gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (c,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
    w3 = jax.random.normal(ks[3], (3, 3, c, o), jnp.float32) * 0.05
    bias = 0.1 * jax.random.normal(ks[4], (o,), jnp.float32)
    return x, gamma, beta, w3, bias, ks[5]


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 128, 128),     # smallest aligned case
    (1, 4, 16, 160, 320),    # C%32 but not %128; O=320 (SDXL level-0 width)
    (2, 4, 8, 192, 256),
])
def test_fused_matches_ref(monkeypatch, shape):
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")
    b, h, w, c, o = shape
    x, gamma, beta, w3, bias, k = _mk(b, h, w, c, o)
    assert fused_supported(x.shape, w3.shape)
    sx = float(jnp.max(jnp.abs(x))) / 127.0 + 1e-6
    got = fused_gn_silu_conv3x3(x, gamma, beta, 32, 1e-5, w3, bias, sx)
    want = fused_gn_silu_conv3x3_ref(x, gamma, beta, 32, 1e-5, w3, bias, sx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_fused_with_temb_and_residual(monkeypatch):
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")
    b, h, w, c, o = 2, 8, 8, 128, 128
    x, gamma, beta, w3, bias, k = _mk(b, h, w, c, o, key=3)
    temb = jax.random.normal(k, (b, o), jnp.float32)
    residual = jax.random.normal(jax.random.PRNGKey(9), (b, h, w, o),
                                 jnp.float32)
    sx = float(jnp.max(jnp.abs(x))) / 127.0 + 1e-6
    got = fused_gn_silu_conv3x3(x, gamma, beta, 32, 1e-5, w3, bias, sx,
                                temb=temb, residual=residual)
    want = fused_gn_silu_conv3x3_ref(x, gamma, beta, 32, 1e-5, w3, bias, sx,
                                     temb=temb, residual=residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_fused_bf16_io(monkeypatch):
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")
    b, h, w, c, o = 1, 4, 8, 128, 128
    x, gamma, beta, w3, bias, _ = _mk(b, h, w, c, o, key=5)
    x = x.astype(jnp.bfloat16)
    sx = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) / 127.0 + 1e-6
    got = fused_gn_silu_conv3x3(x, gamma, beta, 32, 1e-5, w3, bias, sx)
    want = fused_gn_silu_conv3x3_ref(x, gamma, beta, 32, 1e-5, w3, bias, sx)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_resnet_block_fused_path_matches_plain(monkeypatch):
    """ResnetBlock2D under a record->apply static-quant scope: the fused
    Pallas path (PMIX_FUSED_RESNET=1) must match the plain static-quant
    composition within int8 tolerance, consuming the SAME recorded scales in
    the same order (conv1, conv2, shortcut)."""
    from paddlemix_tpu.diffusers.models.resnet import ResnetBlock2D
    from paddlemix_tpu.ops.quant import static_a8w8_scope

    block = ResnetBlock2D(out_channels=256, quant="a8w8_static",
                          dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 128), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(1), (2, 64), jnp.float32)
    params = block.init(jax.random.PRNGKey(2), x, temb)

    with static_a8w8_scope("record") as ctx:
        block.apply(params, x, temb)
        scales = [float(v) for v in ctx.scales]
    assert len(scales) == 3  # conv1, conv2, conv_shortcut

    monkeypatch.setenv("PMIX_FUSED_RESNET", "0")
    with static_a8w8_scope("apply", scales):
        plain = block.apply(params, x, temb)

    monkeypatch.setenv("PMIX_FUSED_RESNET", "1")
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")
    with static_a8w8_scope("apply", scales) as ctx2:
        fused = block.apply(params, x, temb)
        assert ctx2.i == 3  # all three scales consumed in fused mode too

    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               atol=2e-2, rtol=2e-2)


def test_fused_unsupported_falls_back():
    # W not a multiple of 8 -> XLA reference path, still correct
    b, h, w, c, o = 1, 4, 6, 128, 128
    x, gamma, beta, w3, bias, _ = _mk(b, h, w, c, o, key=7)
    assert not fused_supported(x.shape, w3.shape)
    sx = float(jnp.max(jnp.abs(x))) / 127.0 + 1e-6
    got = fused_gn_silu_conv3x3(x, gamma, beta, 32, 1e-5, w3, bias, sx)
    assert got.shape == (b, h, w, o)
