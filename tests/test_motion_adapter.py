"""AnimateDiff motion-adapter loading: a diffusers-format motion state dict
(down_blocks.N.motion_modules.M.transformer_blocks.K...) round-trips into the
motion UNet's params (reference unet_motion_model.py MotionAdapter +
load_motion_modules)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import traverse_util

from paddlemix_tpu.diffusers.models import UNetMotionConfig, UNetMotionModel

TINY = dict(
    sample_size=16, block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, cross_attention_dim=24, attention_head_dim=2,
    norm_num_groups=8, num_frames=2, motion_num_heads=2,
)


def _fake_adapter_sd(params):
    """Build a diffusers-style motion state dict from the model's own motion
    params (values shifted so the load is observable)."""
    sd = {}
    for kpath, val in traverse_util.flatten_dict(params).items():
        name = ".".join(kpath)
        if "motion_modules_" not in name:
            continue
        arr = np.asarray(val) + 0.05
        import re

        name = re.sub(r"(down_blocks|up_blocks)_(\d+)\.", r"\1.\2.", name)
        name = name.replace("motion_modules_", "motion_modules.")
        name = re.sub(r"motion_modules\.(\d+)\.", r"motion_modules.\1.", name)
        name = name.replace("transformer_blocks_", "transformer_blocks.")
        name = name.replace(".to_out.", ".to_out.0.")
        name = name.replace(".ff.net_0.", ".ff.net.0.")
        name = name.replace(".ff.net_2.", ".ff.net.2.")
        if name.endswith(".scale"):
            name = name[: -len(".scale")] + ".weight"
        elif name.endswith(".kernel"):
            name = name[: -len(".kernel")] + ".weight"
            if arr.ndim == 2:
                arr = arr.T
        sd[name] = arr
    return sd


def test_motion_adapter_roundtrip():
    model = UNetMotionModel.from_config(UNetMotionConfig.from_dict(TINY), seed=0)
    before = traverse_util.flatten_dict(model.params)
    sd = _fake_adapter_sd(model.params)
    assert len(sd) > 20
    n = model.load_motion_adapter(sd)
    assert n == len(sd), (n, len(sd))
    after = traverse_util.flatten_dict(model.params)
    for k, v in after.items():
        name = ".".join(k)
        if "motion_modules_" in name:
            np.testing.assert_allclose(np.asarray(v),
                                       np.asarray(before[k]) + 0.05, atol=1e-6)
        else:
            np.testing.assert_allclose(np.asarray(v), np.asarray(before[k]),
                                       atol=0)


def test_motion_unet_forward_after_adapter_load():
    model = UNetMotionModel.from_config(UNetMotionConfig.from_dict(TINY), seed=0)
    model.load_motion_adapter(_fake_adapter_sd(model.params))
    x = jnp.ones((1, 2, 16, 16, 4))
    ctx = jnp.ones((1, 4, 24))
    out = model.module.apply({"params": model.params}, x, jnp.asarray(3), ctx)
    assert out.shape == (1, 2, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_motion_modules_couple_frames():
    model = UNetMotionModel.from_config(UNetMotionConfig.from_dict(TINY), seed=0)
    ctx = jnp.ones((1, 4, 24))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 4))
    x2 = x.at[:, 1].add(1.0)
    o1 = model.module.apply({"params": model.params}, x, jnp.asarray(3), ctx)
    o2 = model.module.apply({"params": model.params}, x2, jnp.asarray(3), ctx)
    assert float(jnp.abs(o1[:, 0] - o2[:, 0]).max()) > 1e-6
