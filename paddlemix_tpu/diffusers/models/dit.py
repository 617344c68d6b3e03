"""DiT (class-conditional diffusion transformer).

Rebuild of the reference DiT/LargeDiT training+inference stack
(ppdiffusers/examples/class_conditional_image_generation/DiT/diffusion/dit.py:
105-173 Column/RowParallel blocks, transformer_2d.py / dit_llama.py). TPU
design: plain flax modules + PartitionSpec rules instead of parallel layer
classes; adaLN-zero modulation runs through the fused Pallas adaLN kernels
(ops/norms.py) exactly at the reference's triton fusion boundaries
(simplified_sd3.py:64-108)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ...ops.norms import adaptive_layer_norm, layer_norm_xla
from .embeddings import LabelEmbedding, TimestepEmbedding, Timesteps, get_2d_sincos_pos_embed


@dataclasses.dataclass
class DiTConfig(BaseConfig):
    model_type = "dit"
    sample_size: int = 32          # latent spatial size
    patch_size: int = 2
    in_channels: int = 4
    out_channels: int = 8          # 4 mean + 4 variance (learn_sigma)
    hidden_size: int = 1152
    num_layers: int = 28
    num_attention_heads: int = 16
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    class_dropout_prob: float = 0.1
    # per-block remat (reference recompute)
    gradient_checkpointing: bool = False


class DiTBlock(nn.Module):
    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        """x: (B, N, D) tokens; c: (B, D) conditioning."""
        d = self.hidden_size
        # adaLN-zero: 6 modulation params from conditioning
        mod = nn.Dense(6 * d, dtype=self.dtype, name="adaLN_modulation",
                       kernel_init=nn.initializers.zeros)(nn.silu(c))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = \
            jnp.split(mod, 6, axis=-1)

        h = adaptive_layer_norm(x.astype(jnp.float32), scale_msa.astype(jnp.float32),
                                shift_msa.astype(jnp.float32)).astype(x.dtype)
        b, n, _ = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, n, 3 * self.num_heads, head_dim), 3, axis=2)
        attn = scaled_dot_product_attention(q, k, v).reshape(b, n, d)
        attn = nn.Dense(d, dtype=self.dtype, name="proj")(attn)
        x = x + gate_msa[:, None, :] * attn

        h = adaptive_layer_norm(x.astype(jnp.float32), scale_mlp.astype(jnp.float32),
                                shift_mlp.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(h)
        return x + gate_mlp[:, None, :] * h


class DiTModule(nn.Module):
    config: DiTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, class_labels, rng=None):
        """latents: (B, H, W, C) NHWC; timesteps: (B,); class_labels: (B,)."""
        cfg = self.config
        d = cfg.hidden_size
        b, hgt, wid, _ = latents.shape
        p = cfg.patch_size
        gh, gw = hgt // p, wid // p

        x = nn.Conv(d, (p, p), strides=(p, p), padding="VALID", dtype=self.dtype,
                    name="patch_proj")(latents)
        x = x.reshape(b, gh * gw, d)
        pos = get_2d_sincos_pos_embed(d, gh, gw, base_size=gh)
        x = x + pos[None].astype(x.dtype)

        t_emb = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0.0)(timesteps)
        t_emb = TimestepEmbedding(d, dtype=self.dtype, name="t_embedder")(t_emb.astype(self.dtype))
        y_emb = LabelEmbedding(cfg.num_classes, d, cfg.class_dropout_prob,
                               dtype=self.dtype, name="y_embedder")(class_labels, rng=rng)
        c = t_emb + y_emb

        for i in range(cfg.num_layers):
            blk = DiTBlock(d, cfg.num_attention_heads, cfg.mlp_ratio,
                           dtype=self.dtype, name=f"blocks_{i}")
            if cfg.gradient_checkpointing:
                x = nn.remat(lambda m, a, cc: m(a, cc),
                             prevent_cse=False)(blk, x, c)
            else:
                x = blk(x, c)

        # final adaLN + linear
        mod = nn.Dense(2 * d, dtype=self.dtype, name="final_adaLN",
                       kernel_init=nn.initializers.zeros)(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = adaptive_layer_norm(x.astype(jnp.float32), scale.astype(jnp.float32),
                                shift.astype(jnp.float32)).astype(x.dtype)
        x = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype, name="final_proj")(x)

        # unpatchify -> (B, H, W, out)
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(b, gh * p, gw * p, cfg.out_channels)


class DiTModel(PretrainedModel):
    config_class = DiTConfig
    module_class = DiTModule

    @classmethod
    def example_inputs(cls, config):
        s = config.sample_size
        return (jnp.zeros((1, s, s, config.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1,), jnp.int32)), {}
