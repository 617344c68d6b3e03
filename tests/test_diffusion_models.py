"""UNet2DCondition + AutoencoderKL tests (tiny configs, jit, io round-trips).

Mirrors the reference's diffusion model test style
(ppdiffusers/tests/models/test_models_unet_2d_condition.py fast tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.diffusers.models import (
    AutoencoderKL,
    AutoencoderKLConfig,
    UNet2DConditionConfig,
    UNet2DConditionModel,
)

TINY_UNET = dict(
    sample_size=16,
    block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=24,
    attention_head_dim=2,
    norm_num_groups=8,
)

TINY_SDXL = dict(
    sample_size=16,
    block_out_channels=(16, 32),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    cross_attention_dim=24,
    attention_head_dim=(2, 4),
    transformer_layers_per_block=(1, 2),
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24 + 6 * 8,
    norm_num_groups=8,
)


def test_unet_forward_shape_and_jit():
    model = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 24))
    out = jax.jit(model.apply)(model.params, x, jnp.asarray(10), ctx)
    assert out.shape == (2, 16, 16, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_timestep_broadcast_and_batch_timesteps():
    model = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    x = jnp.ones((2, 16, 16, 4))
    ctx = jnp.ones((2, 8, 24))
    o1 = model(x, jnp.asarray(5), ctx)
    o2 = model(x, jnp.asarray([5, 5]), ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_unet_sdxl_variant():
    model = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_SDXL))
    x = jnp.ones((1, 16, 16, 4))
    ctx = jnp.ones((1, 8, 24))
    added = {"text_embeds": jnp.ones((1, 24)), "time_ids": jnp.ones((1, 6))}
    out = model(x, jnp.asarray(3), ctx, added_cond_kwargs=added)
    assert out.shape == (1, 16, 16, 4)


def test_unet_save_load(tmp_path):
    model = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    model.save_pretrained(str(tmp_path))
    model2 = UNet2DConditionModel.from_pretrained(str(tmp_path))
    x = jnp.ones((1, 16, 16, 4))
    ctx = jnp.ones((1, 4, 24))
    np.testing.assert_allclose(
        np.asarray(model(x, jnp.asarray(1), ctx)),
        np.asarray(model2(x, jnp.asarray(1), ctx)), atol=1e-5)


def test_unet_resolution_flexibility():
    """Same params work at multiple latent sizes (pipeline requirement)."""
    model = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    ctx = jnp.ones((1, 4, 24))
    for s in (8, 16, 32):
        out = model(jnp.ones((1, s, s, 4)), jnp.asarray(1), ctx)
        assert out.shape == (1, s, s, 4)


def test_unet_grads_flow():
    model = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jnp.ones((1, 4, 24))

    def loss(p):
        return jnp.mean(model.apply(p, x, jnp.asarray(1), ctx) ** 2)

    g = jax.grad(loss)(model.params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


TINY_VAE = dict(
    block_out_channels=(8, 16),
    down_block_types=("DownEncoderBlock2D",) * 2,
    up_block_types=("UpDecoderBlock2D",) * 2,
    layers_per_block=1,
    latent_channels=4,
    norm_num_groups=4,
    sample_size=32,
)


def test_vae_encode_decode_roundtrip(tmp_path):
    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    posterior = vae.encode(x)
    assert posterior.mean.shape == (2, 16, 16, 4)
    rec = vae.decode(posterior.mode())
    assert rec.shape == x.shape
    # kl finite, sampling works
    kl = posterior.kl()
    assert kl.shape == (2,) and bool(jnp.all(jnp.isfinite(kl)))
    z = posterior.sample(jax.random.PRNGKey(1))
    assert z.shape == posterior.mean.shape
    # io round-trip
    vae.save_pretrained(str(tmp_path))
    vae2 = AutoencoderKL.from_pretrained(str(tmp_path))
    np.testing.assert_allclose(np.asarray(vae2.encode(x).mean),
                               np.asarray(posterior.mean), atol=1e-5)


def test_torch_style_checkpoint_loads(tmp_path):
    """Round-trip through torch-layout keys exercises the rename+transpose map."""
    import torch

    vae = AutoencoderKL.from_config(AutoencoderKLConfig.from_dict(TINY_VAE))
    from paddlemix_tpu.core.modeling import flatten_params

    flat = flatten_params(vae.params)
    # rebuild a torch-style state dict by inverting our naming
    torch_sd = {}
    for k, v in flat.items():
        tk = k
        tk = tk.replace(".kernel", ".weight").replace(".scale", ".weight")
        import re

        tk = re.sub(r"_(\d+)\.", r".\1.", tk)
        tk = tk.replace(".to_out.", ".to_out.0.")
        arr = np.asarray(v)
        if k.endswith(".kernel") and arr.ndim == 2:
            arr = arr.T
        elif k.endswith(".kernel") and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        torch_sd[tk] = torch.from_numpy(arr.copy())
    torch.save(torch_sd, str(tmp_path / "diffusion_pytorch_model.bin"))
    vae.config.save_pretrained(str(tmp_path))

    vae2 = AutoencoderKL.from_pretrained(str(tmp_path))
    x = jnp.ones((1, 32, 32, 3))
    np.testing.assert_allclose(np.asarray(vae2.encode(x).mean),
                               np.asarray(vae.encode(x).mean), atol=1e-5)

def test_unet_a8w8_quant_golden_delta():
    """int8 a8w8 fast path: same params, output drift bounded (the CPU
    golden-delta gate for the quantized serving path; reference analog:
    ppdiffusers deploy fast tests' tolerance on quantized outputs)."""
    base = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    qcfg = dict(TINY_UNET, quant="a8w8")
    qmodel = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(qcfg))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 24))
    ref = base.apply(base.params, x, jnp.asarray(10), ctx)
    quant = qmodel.apply(base.params, x, jnp.asarray(10), ctx)  # same weights
    rel = float(jnp.linalg.norm(quant - ref) / jnp.linalg.norm(ref))
    assert rel < 0.15, rel
    assert bool(jnp.all(jnp.isfinite(quant)))


def test_unet_tome_golden_delta():
    """ToMe merging on: output stays close to the unmerged model."""
    base = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(TINY_UNET))
    tcfg = dict(TINY_UNET, tome_ratio=0.25)
    tmodel = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(tcfg))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 24))
    ref = base.apply(base.params, x, jnp.asarray(10), ctx)
    tout = tmodel.apply(base.params, x, jnp.asarray(10), ctx)
    rel = float(jnp.linalg.norm(tout - ref) / jnp.linalg.norm(ref))
    assert rel < 0.25, rel


def test_quantizing_dot_general_matches_fp():
    from paddlemix_tpu.ops.quant import quantizing_dot_general

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 128))
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 256)) * 0.05
    dn = (((2,), (0,)), ((), ()))
    ref = jax.lax.dot_general(x, w, dn)
    q = quantizing_dot_general(x, w, dn)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # non-Dense pattern falls back to the fp dot exactly
    dn_bmm = (((2,), (1,)), ((0,), (0,)))
    wb = jax.random.normal(jax.random.PRNGKey(2), (4, 128, 32))
    np.testing.assert_allclose(
        np.asarray(quantizing_dot_general(x, wb, dn_bmm)),
        np.asarray(jax.lax.dot_general(x, wb, dn_bmm)), atol=1e-6)


def test_quantizing_conv_matches_fp():
    from paddlemix_tpu.ops.quant import quantizing_conv_general_dilated

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 32))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 64)) * 0.05
    dn = ("NHWC", "HWIO", "NHWC")
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    q = quantizing_conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    rel = float(jnp.linalg.norm(q - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
