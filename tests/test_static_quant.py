"""Static-scale a8w8 PTQ (ops/static_quant.py): calibration records per-layer
activation absmax, and the quantized() interceptor reruns Dense/Conv as int8
with those scales — no model-code changes, jit-compatible.

Reference counterpart: paddle PTQ static quant passes + triton
weight_only_int8 (SURVEY §2.1 Triton ops; deploy quant configs)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from paddlemix_tpu.ops.static_quant import calibrate, quantized


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding="SAME", name="conv")(x)
        x = nn.silu(x)
        x = x.reshape(x.shape[0], -1, 64)
        x = nn.Dense(128, name="fc1")(x)
        x = nn.silu(x)
        return nn.Dense(64, name="fc2")(x)


def _setup():
    net = _Net()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    params = net.init(jax.random.PRNGKey(1), x)
    return net, params, x


def test_calibrate_records_all_layers():
    net, params, x = _setup()
    scales = calibrate(net, params, x)
    assert set(scales) == {"conv", "fc1", "fc2"}
    assert all(s > 0 for s in scales.values())


def test_quantized_matches_fp_closely():
    net, params, x = _setup()
    scales = calibrate(net, params, x)
    ref = net.apply(params, x)
    with quantized(scales):
        q = jax.jit(lambda p, x: net.apply(p, x))(params, x)
    ref, q = np.asarray(ref), np.asarray(q)
    rel = np.abs(q - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.1, rel  # int8 PTQ error, not garbage
    assert not np.allclose(q, ref, atol=1e-6)  # and it really quantized


def test_uncalibrated_layers_stay_fp():
    net, params, x = _setup()
    scales = calibrate(net, params, x)
    scales.pop("fc2")
    ref = net.apply(params, x)
    with quantized(scales):
        partial_q = net.apply(params, x)
    with quantized(calibrate(net, params, x)):
        full_q = net.apply(params, x)
    # dropping fc2 from the table changes the result vs fully-quantized
    assert float(np.abs(np.asarray(partial_q) - np.asarray(full_q)).max()) > 0
    # and partial stays closer to fp than garbage
    rel = np.abs(np.asarray(partial_q) - np.asarray(ref)).max() / np.abs(ref).max()
    assert rel < 0.1


def test_trace_order_scope_on_quant_configured_unet():
    """The zero-interception variant (ops/quant.py static_a8w8_scope): a UNet
    built with quant="a8w8_static" runs plain fp outside any scope, records
    per-op amax under a "record" scope, and consumes the scales in call order
    under an "apply" scope — the mechanism behind the bench's default mode."""
    from paddlemix_tpu.diffusers.models import (
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )
    from paddlemix_tpu.ops.quant import static_a8w8_scope

    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32, attention_head_dim=2,
        norm_num_groups=8, quant="a8w8_static")))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    t = jnp.asarray(7)
    ref = unet.module.apply({"params": unet.params}, lat, t, ctx)  # no scope: fp

    def calib(params, lat):
        with static_a8w8_scope("record") as c:
            unet.module.apply({"params": params}, lat, t, ctx)
        return jnp.stack(c.scales)

    scales = np.asarray(jax.jit(calib)(unet.params, lat))
    assert len(scales) > 30
    with static_a8w8_scope("apply", [float(v) for v in scales]):
        q = jax.jit(lambda p, l: unet.module.apply({"params": p}, l, t, ctx))(
            unet.params, lat)
    rel = float(jnp.abs(q - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert np.isfinite(np.asarray(q)).all()
    assert 1e-6 < rel < 0.35, rel  # quantized, but close to fp


def test_quantized_on_real_unet_block():
    """End-to-end on the tiny conditional UNet used by the pipeline tests."""
    from paddlemix_tpu.diffusers.models import (
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(dict(
        sample_size=8, block_out_channels=(32, 64),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, cross_attention_dim=32, attention_head_dim=2,
        norm_num_groups=8)))
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    t = jnp.asarray(7)
    ref = unet.module.apply({"params": unet.params}, lat, t, ctx)
    scales = calibrate(unet.module, {"params": unet.params}, lat, t, ctx)
    assert len(scales) > 10
    with quantized(scales):
        q = jax.jit(lambda p, l: unet.module.apply({"params": p}, l, t, ctx))(
            unet.params, lat)
    rel = float(jnp.abs(q - ref).max() / (jnp.abs(ref).max() + 1e-9))
    assert np.isfinite(np.asarray(q)).all()
    assert rel < 0.35, rel  # deep int8 stack w/ random weights: loose but sane
