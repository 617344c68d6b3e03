"""VAE variants (VERDICT r4 task 9): AutoencoderTiny round-trip + torch
checkpoint-layout parity, AsymmetricAutoencoderKL mask conditioning,
ConsistencyDecoderVAE 2-step decode."""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.diffusers.models import (
    AsymmetricAutoencoderKL,
    AsymmetricAutoencoderKLConfig,
    AutoencoderTiny,
    AutoencoderTinyConfig,
    ConsistencyDecoderVAE,
    ConsistencyDecoderVAEConfig,
)


def _tiny_cfg():
    return AutoencoderTinyConfig(
        encoder_block_out_channels=(8, 8), decoder_block_out_channels=(8, 8),
        num_encoder_blocks=(1, 1), num_decoder_blocks=(1, 1),
        latent_channels=4)


def test_autoencoder_tiny_shapes_and_scale():
    cfg = _tiny_cfg()
    model = AutoencoderTiny.from_config(cfg, seed=0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3), jnp.float32)
    z = model.encode(x)
    assert z.shape == (1, 8, 8, 4)  # one stride-2 stage
    y = model.decode(z)
    assert y.shape == (1, 16, 16, 3)
    # scale/unscale round-trip inside the representable range
    lat = jnp.asarray(np.random.RandomState(1).uniform(-2.5, 2.5, (2, 4)))
    scaled = model.module.apply({"params": model.params}, lat,
                                method=model.module.scale_latents)
    unscaled = model.module.apply({"params": model.params}, scaled,
                                  method=model.module.unscale_latents)
    np.testing.assert_allclose(np.asarray(unscaled), np.asarray(lat), atol=1e-5)


def test_autoencoder_tiny_torch_layout_roundtrip():
    """A torch-style TAESD state dict (encoder.layers.N Sequential keys)
    converts into the flax tree and loads: layout fidelity for madebyollin
    taesd/taesdxl checkpoints."""
    import torch.nn as tnn
    import torch

    torch.manual_seed(0)
    enc = tnn.Sequential(
        tnn.Conv2d(3, 8, 3, padding=1),
        _torch_tiny_block(8),
        tnn.Conv2d(8, 8, 3, padding=1, stride=2, bias=False),
        _torch_tiny_block(8),
        tnn.Conv2d(8, 4, 3, padding=1))
    dec = tnn.Sequential(
        tnn.Conv2d(4, 8, 3, padding=1),
        tnn.ReLU(),
        _torch_tiny_block(8),
        tnn.Upsample(scale_factor=2),
        tnn.Conv2d(8, 8, 3, padding=1, bias=False),
        _torch_tiny_block(8),
        tnn.Conv2d(8, 3, 3, padding=1))
    flat = {f"encoder.layers.{k}": v.numpy()
            for k, v in enc.state_dict().items()}
    flat.update({f"decoder.layers.{k}": v.numpy()
                 for k, v in dec.state_dict().items()})
    model = AutoencoderTiny.from_state_dict(_tiny_cfg(), flat)
    x = np.random.RandomState(2).randn(1, 16, 16, 3).astype(np.float32)
    z = model.encode(jnp.asarray(x))
    y = model.decode(z)
    # torch twin forward (same convention: [-1,1] -> [0,1] in, tanh clamp)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        zt = enc((xt + 1) / 2)
        yt = dec(torch.tanh(zt / 3) * 3) * 2 - 1
    np.testing.assert_allclose(np.asarray(z),
                               np.transpose(zt.numpy(), (0, 2, 3, 1)),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(y),
                               np.transpose(yt.numpy(), (0, 2, 3, 1)),
                               atol=2e-5, rtol=1e-4)


def _torch_tiny_block(c):
    import torch.nn as tnn

    class Blk(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Sequential(
                tnn.Conv2d(c, c, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(c, c, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(c, c, 3, padding=1))
            self.skip = tnn.Identity()

        def forward(self, x):
            import torch.nn.functional as F

            return F.relu(self.conv(x) + self.skip(x))

    return Blk()


def test_asymmetric_vae_mask_conditioning():
    cfg = AsymmetricAutoencoderKLConfig(
        down_block_out_channels=(8, 16), layers_per_down_block=1,
        up_block_out_channels=(8, 16), layers_per_up_block=1,
        latent_channels=4, norm_num_groups=4)
    model = AsymmetricAutoencoderKL.from_config(cfg, seed=0)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 32, 32, 3), jnp.float32)
    post = model.encode(x)
    assert post.mean.shape == (1, 16, 16, 4)
    # unconditioned decode
    y0 = model.decode(post.mean)
    assert y0.shape == (1, 32, 32, 3)
    # mask-conditioned decode differs from unconditioned (the condition
    # encoder blends masked-image features at every scale)
    mask = jnp.zeros((1, 32, 32, 1)).at[:, :16].set(1.0)
    y1 = model.decode(post.mean, image=x, mask=mask)
    assert y1.shape == (1, 32, 32, 3)
    assert float(jnp.abs(y0 - y1).max()) > 1e-5
    assert bool(jnp.all(jnp.isfinite(y1)))


def test_consistency_decoder_vae():
    cfg = ConsistencyDecoderVAEConfig(
        encoder_block_out_channels=(8, 16), encoder_layers_per_block=1,
        encoder_norm_num_groups=4,
        decoder_block_out_channels=(8, 16), decoder_layers_per_block=1,
        decoder_norm_num_groups=4)
    model = ConsistencyDecoderVAE.from_config(cfg, seed=0)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3), jnp.float32)
    post = model.encode(x)
    assert post.mean.shape == (1, 8, 8, 4)
    img = model.decode(post.mean, key=jax.random.PRNGKey(1))
    assert img.shape == (1, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
    # deterministic given the key; different key -> different sample
    img2 = model.decode(post.mean, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=0)
    img3 = model.decode(post.mean, key=jax.random.PRNGKey(2))
    assert float(jnp.abs(img - img3).max()) > 1e-6
