"""VQ model / MoVQ decoder (Kandinsky's image decoder).

Rebuild of the reference VQModel + MoVQ (ppdiffusers/ppdiffusers/models/vq_model.py,
movq used by kandinsky): encoder reuses the KL-VAE encoder, a nearest-neighbor
vector quantizer, and a decoder whose normalization layers are spatially
modulated by the latent (MoVQ SpatialNorm)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .autoencoder_kl import AutoencoderKLConfig, Encoder
from .resnet import Upsample2D


@dataclasses.dataclass
class VQModelConfig(AutoencoderKLConfig):
    model_type = "vq"
    num_vq_embeddings: int = 16384
    vq_embed_dim: Optional[int] = None
    norm_type: str = "spatial"  # MoVQ


class SpatialNorm(nn.Module):
    """GroupNorm with scale/shift predicted from the (resized) latent."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        zr = jax.image.resize(z, (*x.shape[:3], z.shape[-1]), "nearest")
        h = nn.GroupNorm(num_groups=min(self.groups, x.shape[-1]), epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        scale = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_y")(zr)
        shift = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="conv_b")(zr)
        return h * scale + shift


class MoVQResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, z):
        out_ch = self.out_channels
        h = SpatialNorm(self.groups, dtype=self.dtype, name="norm1")(x, z)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv1")(h)
        h = SpatialNorm(self.groups, dtype=self.dtype, name="norm2")(h, z)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class MoVQDecoder(nn.Module):
    config: VQModelConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(z)
        x = MoVQResnetBlock(rev[0], g, dtype=self.dtype, name="mid_res_0")(x, z)
        x = MoVQResnetBlock(rev[0], g, dtype=self.dtype, name="mid_res_1")(x, z)
        for i, ch in enumerate(rev):
            last = i == len(rev) - 1
            for j in range(cfg.layers_per_block + 1):
                x = MoVQResnetBlock(ch, g, dtype=self.dtype,
                                    name=f"up_{i}_res_{j}")(x, z)
            if not last:
                x = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = SpatialNorm(g, dtype=self.dtype, name="norm_out")(x, z)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv_out")(x)


class VQModelModule(nn.Module):
    config: VQModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, dtype=self.dtype)
        vq_dim = cfg.vq_embed_dim or cfg.latent_channels
        self.quant_conv = nn.Conv(vq_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.codebook = self.param("codebook", nn.initializers.uniform(1.0),
                                   (cfg.num_vq_embeddings, vq_dim))
        self.decoder = MoVQDecoder(cfg, dtype=self.dtype)

    def quantize(self, z):
        flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
        code = self.codebook.astype(jnp.float32)
        d = (jnp.sum(flat ** 2, -1, keepdims=True) - 2 * flat @ code.T
             + jnp.sum(code ** 2, -1)[None])
        idx = jnp.argmin(d, axis=-1)
        zq = code[idx].reshape(z.shape).astype(z.dtype)
        # straight-through estimator
        return z + jax.lax.stop_gradient(zq - z), idx.reshape(z.shape[:-1])

    def encode(self, x):
        h = self.quant_conv(self.encoder(x))
        # encoder outputs 2*latent (KL layout); take the mean half for VQ
        if h.shape[-1] == 2 * (self.config.vq_embed_dim or self.config.latent_channels):
            h = jnp.split(h, 2, axis=-1)[0]
        return h

    def decode(self, z, force_quantize: bool = True):
        if force_quantize:
            z, _ = self.quantize(z)
        return self.decoder(self.post_quant_conv(z))

    def decode_code(self, indices, shape=None):
        """Token map -> image (VQ-Diffusion path): codebook lookup + decode.
        indices: (B, N) or (B, H, W) int; shape=(B, H, W) for the flat form."""
        idx = jnp.clip(indices, 0, self.codebook.shape[0] - 1)
        z = self.codebook[idx]
        if shape is not None:
            z = z.reshape(*shape, z.shape[-1])
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x):
        z = self.encode(x)
        zq, idx = self.quantize(z)
        return self.decode(zq, force_quantize=False), zq, idx


class VQModel(PretrainedModel):
    config_class = VQModelConfig
    module_class = VQModelModule

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.block_out_channels) - 1)
        s = 4 * f
        return (jnp.zeros((1, s, s, config.in_channels)),), {}

    def decode(self, z, force_quantize: bool = True):
        return self.module.apply({"params": self.params}, z, force_quantize,
                                 method=self.module.decode)

    def decode_code(self, indices, shape=None):
        return self.module.apply({"params": self.params}, indices, shape,
                                 method=self.module.decode_code)
