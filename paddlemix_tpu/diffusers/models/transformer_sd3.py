"""SD3 MM-DiT (dual-stream joint-attention diffusion transformer).

Rebuild of the reference SD3 transformer
(ppdiffusers/ppdiffusers/models/transformer_sd3.py:427 +
simplified_sd3.py:160 — the inference-optimized variant that calls
paddlemix.triton_ops fused kernels at :64-108). Here the fused boundaries are
the same but implemented with the Pallas adaLN / adaLN-scale-residual kernels
(ops/norms.py), always on — no INFERENCE_OPTIMIZE env split. diffusers SD3
checkpoints load via the regex map."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention
from ...ops.norms import adaptive_layer_norm, fused_adaln_scale_residual
from .embeddings import PatchEmbed2D, TimestepEmbedding, Timesteps


@dataclasses.dataclass
class SD3TransformerConfig(BaseConfig):
    model_type = "sd3_transformer"
    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    out_channels: int = 16
    pos_embed_max_size: int = 192
    # per-block remat (reference recompute / enable_gradient_checkpointing)
    gradient_checkpointing: bool = False

    @property
    def hidden_size(self) -> int:
        return self.num_attention_heads * self.attention_head_dim


class JointTransformerBlock(nn.Module):
    """One MM-DiT block: separate img/context streams, joint attention."""

    num_heads: int
    head_dim: int
    context_pre_only: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, temb):
        d = self.num_heads * self.head_dim
        f32 = jnp.float32

        # image-stream adaLN-zero (6 params)
        mod_x = nn.Dense(6 * d, dtype=self.dtype, name="norm1_linear")(nn.silu(temb))
        sx, scx, gx, sx2, scx2, gx2 = jnp.split(mod_x, 6, axis=-1)
        # context-stream modulation: 6 params, or 2 for the final block
        n_ctx_mod = 2 if self.context_pre_only else 6
        mod_c = nn.Dense(n_ctx_mod * d, dtype=self.dtype,
                         name="norm1_context_linear")(nn.silu(temb))
        if self.context_pre_only:
            sc, scc = jnp.split(mod_c, 2, axis=-1)
            gc = gc2 = sc2 = scc2 = None
        else:
            sc, scc, gc, sc2, scc2, gc2 = jnp.split(mod_c, 6, axis=-1)

        hx = adaptive_layer_norm(x.astype(f32), scx.astype(f32), sx.astype(f32)).astype(x.dtype)
        hc = adaptive_layer_norm(context.astype(f32), scc.astype(f32), sc.astype(f32)).astype(x.dtype)

        b, nx = x.shape[:2]
        nc = context.shape[1]
        qkv_x = nn.Dense(3 * d, dtype=self.dtype, name="attn_qkv")(hx)
        qkv_c = nn.Dense(3 * d, dtype=self.dtype, name="attn_add_qkv")(hc)
        qx, kx, vx = jnp.split(qkv_x.reshape(b, nx, 3 * self.num_heads, self.head_dim), 3, axis=2)
        qc, kc, vc = jnp.split(qkv_c.reshape(b, nc, 3 * self.num_heads, self.head_dim), 3, axis=2)
        q = jnp.concatenate([qc, qx], axis=1)
        k = jnp.concatenate([kc, kx], axis=1)
        v = jnp.concatenate([vc, vx], axis=1)
        attn = scaled_dot_product_attention(q, k, v).reshape(b, nc + nx, d)
        attn_c, attn_x = attn[:, :nc], attn[:, nc:]

        attn_x = nn.Dense(d, dtype=self.dtype, name="attn_to_out")(attn_x)
        # fused: x = x + gate*attn; h = adaLN(x) (reference fused_adaLN_scale_residual)
        hx2, x = fused_adaln_scale_residual(
            x.astype(f32), attn_x.astype(f32), gx.astype(f32),
            scx2.astype(f32), sx2.astype(f32))
        hx2 = hx2.astype(attn_x.dtype)
        x = x.astype(attn_x.dtype)
        h = nn.Dense(4 * d, dtype=self.dtype, name="ff_fc1")(hx2)
        h = nn.gelu(h, approximate=True)
        x = x + gx2[:, None, :] * nn.Dense(d, dtype=self.dtype, name="ff_fc2")(h)

        if self.context_pre_only:
            return x, None
        attn_c = nn.Dense(d, dtype=self.dtype, name="attn_to_add_out")(attn_c)
        hc2, context = fused_adaln_scale_residual(
            context.astype(f32), attn_c.astype(f32), gc.astype(f32),
            scc2.astype(f32), sc2.astype(f32))
        hc2 = hc2.astype(attn_c.dtype)
        context = context.astype(attn_c.dtype)
        h = nn.Dense(4 * d, dtype=self.dtype, name="ff_context_fc1")(hc2)
        h = nn.gelu(h, approximate=True)
        context = context + gc2[:, None, :] * nn.Dense(d, dtype=self.dtype,
                                                       name="ff_context_fc2")(h)
        return x, context


class SD3TransformerModule(nn.Module):
    config: SD3TransformerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, latents, timesteps, encoder_hidden_states, pooled_projections):
        cfg = self.config
        d = cfg.hidden_size
        b, hgt, wid, _ = latents.shape
        p = cfg.patch_size
        gh, gw = hgt // p, wid // p

        x = PatchEmbed2D(p, d, base_size=cfg.sample_size // p, dtype=self.dtype,
                         name="pos_embed")(latents)

        t_emb = Timesteps(256, flip_sin_to_cos=True, downscale_freq_shift=0.0)(timesteps)
        temb = TimestepEmbedding(d, dtype=self.dtype, name="timestep_embedder")(
            t_emb.astype(self.dtype))
        pooled = TimestepEmbedding(d, dtype=self.dtype, name="text_embedder")(
            pooled_projections.astype(self.dtype))
        temb = temb + pooled

        context = nn.Dense(d, dtype=self.dtype, name="context_embedder")(encoder_hidden_states)

        for i in range(cfg.num_layers):
            blk = JointTransformerBlock(
                cfg.num_attention_heads, cfg.attention_head_dim,
                context_pre_only=(i == cfg.num_layers - 1), dtype=self.dtype,
                name=f"transformer_blocks_{i}")
            if cfg.gradient_checkpointing:
                x, context = nn.remat(
                    lambda m, a, c, t: m(a, c, t), prevent_cse=False)(
                    blk, x, context, temb)
            else:
                x, context = blk(x, context, temb)

        mod = nn.Dense(2 * d, dtype=self.dtype, name="norm_out_linear")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = adaptive_layer_norm(x.astype(jnp.float32), scale.astype(jnp.float32),
                                shift.astype(jnp.float32)).astype(x.dtype)
        x = nn.Dense(p * p * cfg.out_channels, dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(b, gh, gw, p, p, cfg.out_channels)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(b, gh * p, gw * p, cfg.out_channels)


_SD3_KEY_MAP = (
    (r"\.transformer_blocks\.(\d+)\.", r".transformer_blocks_\1."),
    (r"^transformer_blocks\.(\d+)\.", r"transformer_blocks_\1."),
    (r"\.norm1\.linear\.", r".norm1_linear."),
    (r"\.norm1_context\.linear\.", r".norm1_context_linear."),
    (r"\.norm_out\.linear\.", r".norm_out_linear."),
    (r"\.ff\.net\.0\.proj\.", r".ff_fc1."),
    (r"\.ff\.net\.2\.", r".ff_fc2."),
    (r"\.ff_context\.net\.0\.proj\.", r".ff_context_fc1."),
    (r"\.ff_context\.net\.2\.", r".ff_context_fc2."),
    (r"\.attn\.to_out\.0\.", r".attn_to_out."),
    (r"\.attn\.to_add_out\.", r".attn_to_add_out."),
    (r"\.pos_embed\.proj\.", r".pos_embed.proj."),
    (r"\.weight$", r".kernel"),
)


class SD3Transformer2DModel(PretrainedModel):
    config_class = SD3TransformerConfig
    module_class = SD3TransformerModule
    torch_key_map = _SD3_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        s = min(config.sample_size, 16)
        return (jnp.zeros((1, s, s, config.in_channels)), jnp.zeros((1,)),
                jnp.zeros((1, 8, config.joint_attention_dim)),
                jnp.zeros((1, config.pooled_projection_dim))), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        """diffusers SD3 stores separate to_q/to_k/to_v (+add_*_proj); fuse
        them into the qkv kernels used here."""
        import numpy as np

        from ...core.modeling import convert_torch_state_dict

        fused = {}
        skip = set()
        for k in list(flat.keys()):
            if ".attn.to_q." in k:
                for suffix in ("weight", "bias"):
                    if k.endswith(suffix):
                        kk = k[: -len("to_q." + suffix)]
                        parts = [flat.get(kk + f"to_{n}." + suffix) for n in ("q", "k", "v")]
                        if all(p is not None for p in parts):
                            axis = 0 if suffix == "weight" else 0
                            fused[kk.replace(".attn.", ".attn_") + "qkv." + suffix] = \
                                np.concatenate(parts, axis=axis)
                            skip.update(kk + f"to_{n}." + suffix for n in ("q", "k", "v"))
            if ".attn.add_q_proj." in k:
                for suffix in ("weight", "bias"):
                    if k.endswith(suffix):
                        kk = k[: -len("add_q_proj." + suffix)]
                        parts = [flat.get(kk + f"add_{n}_proj." + suffix) for n in ("q", "k", "v")]
                        if all(p is not None for p in parts):
                            fused[kk.replace(".attn.", ".attn_") + "add_qkv." + suffix] = \
                                np.concatenate(parts, axis=0)
                            skip.update(kk + f"add_{n}_proj." + suffix for n in ("q", "k", "v"))
        out = {k: v for k, v in flat.items() if k not in skip}
        out.update(fused)
        return convert_torch_state_dict(out, cls.torch_key_map)
