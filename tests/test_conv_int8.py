"""Pallas int8 a8w8 conv/matmul kernels vs the XLA int8 reference.

The kernels compute the SAME integer math as lax.conv/dot with int8 inputs
and int32 accumulation, so agreement is exact (up to the fp32 epilogue)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.ops.conv_int8 import (
    _quantize_int8,
    conv3x3_supported,
    int8_a8w8_matmul,
    int8_conv3x3_same,
    quantize_weight_per_cout,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("PMIX_PALLAS_INTERPRET", "1")


def _ref_conv(x, w, sx):
    xq = _quantize_int8(x, sx)
    wq, sw = quantize_weight_per_cout(w)
    acc = jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (sw[None, None, None, :] * sx)


@pytest.mark.parametrize("shape", [(1, 8, 8, 128, 128), (2, 16, 16, 128, 256),
                                   (1, 16, 24, 256, 128)])
def test_conv3x3_matches_xla_int8(shape):
    b, h, w, c, o = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, o), jnp.float32) * 0.05
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    ref = _ref_conv(x, k, sx)
    out = int8_conv3x3_same(x, k, sx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_block_tiling():
    # h not divisible by the default block -> block shrink path
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 8, 128, ), jnp.float32).reshape(1, 12, 8, 128)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.float32) * 0.1
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    np.testing.assert_allclose(np.asarray(int8_conv3x3_same(x, k, sx)),
                               np.asarray(_ref_conv(x, k, sx)),
                               rtol=1e-5, atol=1e-5)


def test_block_selection_sublane_aligned():
    """Regression: SDXL shapes have W%8==0 so w2=W+2 ≡ 2 (mod 8); the row
    block bh*w2 must still be a multiple of 8 (Mosaic tile constraint). The
    1024px run hit (h=64, w2=66, c=1920, o=640) where the VMEM budget drove
    bh down to 2 -> a 132-row block that Mosaic rejects."""
    from paddlemix_tpu.ops.conv_int8 import _select_blocks

    for h, wd, c, o in [(64, 64, 1920, 640), (128, 128, 640, 640),
                        (32, 32, 2560, 1280), (64, 64, 640, 640),
                        (16, 16, 1280, 1280), (8, 8, 128, 128)]:
        sel = _select_blocks(h, wd + 2, c, o)
        assert sel is not None, (h, wd, c, o)
        bh, bo = sel
        assert (bh * (wd + 2)) % 8 == 0
        assert h % bh == 0 and o % bo == 0


def test_conv3x3_fallback_when_no_block_fits():
    """When no aligned block configuration fits VMEM the op still computes
    (9 shifted XLA int8 dots) and matches the reference."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 128), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.float32) * 0.1
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    # h=2 < min_bh=4 -> no legal bh -> fallback path
    np.testing.assert_allclose(np.asarray(int8_conv3x3_same(x, k, sx)),
                               np.asarray(_ref_conv(x, k, sx)),
                               rtol=1e-5, atol=1e-5)


def test_a8w8_matmul_matches_xla_int8():
    m, k, n = 64, 256, 384
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.05
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    xq = _quantize_int8(x, sx)
    wq, sw = quantize_weight_per_cout(w)
    ref = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32).astype(
        jnp.float32) * (sw[None, :] * sx)
    np.testing.assert_allclose(np.asarray(int8_a8w8_matmul(x, w, sx)),
                               np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_a8w8_matmul_batched_input():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 128), jnp.float32) * 0.1
    sx = float(jnp.max(jnp.abs(x))) / 127.0
    out = int8_a8w8_matmul(x, w, sx)
    assert out.shape == (2, 16, 128)


def test_supported_predicate():
    dn = jax.lax.conv_dimension_numbers(
        (1, 8, 8, 128), (3, 3, 128, 128), ("NHWC", "HWIO", "NHWC"))
    assert conv3x3_supported((1, 8, 8, 128), (3, 3, 128, 128), (1, 1),
                             None, None, dn)
    assert not conv3x3_supported((1, 8, 8, 128), (3, 3, 128, 128), (2, 2),
                                 None, None, dn)
    assert not conv3x3_supported((1, 8, 8, 320), (3, 3, 320, 128), (1, 1),
                                 None, None, dn)  # C not lane-aligned
    dn1 = jax.lax.conv_dimension_numbers(
        (1, 8, 8, 128), (1, 1, 128, 128), ("NHWC", "HWIO", "NHWC"))
    assert not conv3x3_supported((1, 8, 8, 128), (1, 1, 128, 128), (1, 1),
                                 None, None, dn1)


def test_static_scope_dispatches_to_pallas():
    """End-to-end: static_a8w8_scope apply mode routes eligible convs/matmuls
    through the Pallas kernels and matches the XLA int8 scope output."""
    from paddlemix_tpu.ops.quant import (
        static_a8w8_scope,
        static_quant_conv_general_dilated,
        static_quant_dot_general,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 128), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 128, 128), jnp.float32) * 0.1
    xm = jax.random.normal(jax.random.PRNGKey(2), (16, 128), jnp.float32)
    wm = jax.random.normal(jax.random.PRNGKey(3), (128, 128), jnp.float32) * 0.1
    dimnums = (((1,), (0,)), ((), ()))

    with static_a8w8_scope("record") as ctx:
        static_quant_conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        static_quant_dot_general(xm, wm, dimnums)
    scales = [float(v) for v in ctx.scales]
    assert len(scales) == 2

    outs = {}
    for backend in ("pallas", "xla"):
        os.environ["PMIX_INT8_CONV"] = backend
        os.environ["PMIX_INT8_MM"] = backend
        try:
            with static_a8w8_scope("apply", scales):
                c = static_quant_conv_general_dilated(
                    x, k, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                d = static_quant_dot_general(xm, wm, dimnums)
            outs[backend] = (np.asarray(c), np.asarray(d))
        finally:
            os.environ.pop("PMIX_INT8_CONV", None)
            os.environ.pop("PMIX_INT8_MM", None)
    np.testing.assert_allclose(outs["pallas"][0], outs["xla"][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(outs["pallas"][1], outs["xla"][1],
                               rtol=1e-5, atol=1e-4)
