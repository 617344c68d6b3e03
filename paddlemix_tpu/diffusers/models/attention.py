"""UNet transformer blocks (reference
ppdiffusers/ppdiffusers/models/attention.py BasicTransformerBlock +
attention_processor.py Attention; transformer_2d.py Transformer2DModel).

The reference dispatches among attention-processor objects (math / cutlass /
flash, attention_processor.py:2146); here everything routes through
ops.scaled_dot_product_attention so the Pallas flash kernel kicks in on TPU.
Param names track the torch layout (to_q/to_k/to_v/to_out, ff.net.0/2)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops import scaled_dot_product_attention
from ...ops.norms import group_norm as fused_group_norm


def _qdg(quant):
    """dot_general override for nn.Dense when int8 inference is on."""
    if quant == "a8w8":
        from ...ops.quant import quantizing_dot_general
        return quantizing_dot_general
    if quant == "a8w8_static":
        from ...ops.quant import static_quant_dot_general
        return static_quant_dot_general
    return None


def _qcg(quant):
    if quant == "a8w8":
        from ...ops.quant import quantizing_conv_general_dilated
        return quantizing_conv_general_dilated
    if quant == "a8w8_static":
        from ...ops.quant import static_quant_conv_general_dilated
        return static_quant_conv_general_dilated
    return None


class CrossAttention(nn.Module):
    """diffusers-style Attention: to_q/to_k/to_v (no bias) + to_out.

    With ip_tokens > 0, implements IP-Adapter's decoupled cross-attention
    (reference ppdiffusers/loaders/ip_adapter.py + IPAdapterAttnProcessor):
    the trailing ip_tokens of `context` are image tokens attended through
    separate to_k_ip/to_v_ip projections, added with ip_scale."""

    num_heads: int
    head_dim: int
    cross_dim: Optional[int] = None
    out_bias: bool = True
    qkv_bias: bool = False
    ip_tokens: int = 0
    ip_scale: float = 1.0
    quant: str = None
    capture_self: bool = False  # sow self-attn probs too (SAG mid-block hook)
    dtype: jnp.dtype = jnp.float32

    def _attend(self, q, ctx, name_k, name_v, capture=False, bias=None,
                sow_name="cross_attn_probs"):
        inner = self.num_heads * self.head_dim
        b, sq = q.shape[:2]
        k = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     dot_general=_qdg(self.quant), name=name_k)(ctx)
        v = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     dot_general=_qdg(self.quant), name=name_v)(ctx)
        sk = k.shape[1]
        qh = q.reshape(b, sq, self.num_heads, self.head_dim)
        kh = k.reshape(b, sk, self.num_heads, self.head_dim)
        vh = v.reshape(b, sk, self.num_heads, self.head_dim)
        if capture:
            # explicit-softmax path so the probabilities exist as a value to
            # record (the reference swaps in AttendExciteAttnProcessor for
            # this, ppdiffusers pipeline_stable_diffusion_attend_and_excite.py
            # AttentionStore); active only under mutable=["intermediates"]
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                                kh.astype(jnp.float32)) * (self.head_dim ** -0.5)
            if bias is not None:
                logits = logits + bias.astype(jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1)
            self.sow("intermediates", sow_name, probs.mean(axis=1))
            out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vh.dtype), vh)
            return out.reshape(b, sq, inner)
        return scaled_dot_product_attention(qh, kh, vh,
                                           bias=bias).reshape(b, sq, inner)

    @nn.compact
    def __call__(self, hidden, context=None, bias=None):
        inner = self.num_heads * self.head_dim
        is_cross = context is not None
        context = hidden if context is None else context
        ip_ctx = None
        if self.ip_tokens > 0 and is_cross and context.shape[1] > self.ip_tokens:
            ip_ctx = context[:, -self.ip_tokens:]
            context = context[:, :-self.ip_tokens]
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                     dot_general=_qdg(self.quant), name="to_q")(hidden)
        capture = ((is_cross or self.capture_self)
                   and self.is_mutable_collection("intermediates"))
        out = self._attend(
            q, context, "to_k", "to_v", capture=capture, bias=bias,
            sow_name="cross_attn_probs" if is_cross else "self_attn_probs")
        if ip_ctx is not None:
            out = out + self.ip_scale * self._attend(q, ip_ctx, "to_k_ip", "to_v_ip")
        return nn.Dense(hidden.shape[-1], use_bias=self.out_bias, dtype=self.dtype,
                        dot_general=_qdg(self.quant), name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """ff.net.0 (GEGLU proj) -> ff.net.2 (out proj), diffusers naming."""

    mult: int = 4
    quant: str = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        inner = d * self.mult
        quant = self.quant

        class _GEGLU(nn.Module):
            dtype: jnp.dtype = jnp.float32

            @nn.compact
            def __call__(self, x):
                hg = nn.Dense(inner * 2, dtype=self.dtype,
                              dot_general=_qdg(quant), name="proj")(x)
                h, gate = jnp.split(hg, 2, axis=-1)
                # reference GEGLU is exact F.gelu (ppdiffusers/models/
                # activations.py:98-99). In sub-f32 dtypes the tanh
                # approximation is within 2 ulp of exact (max |erf-tanh| gelu
                # gap 5e-4 < bf16 rounding of exact gelu itself, 1.8e-2) and
                # XLA's erf polynomial costs 10.7 ms/step on the SDXL-1024
                # denoise (step 100.2 -> 89.5 ms measured on v5e), so: exact
                # at f32 (parity), tanh below (identical after rounding).
                exact = gate.dtype == jnp.float32
                return h * nn.gelu(gate, approximate=not exact)

        h = _GEGLU(dtype=self.dtype, name="net_0")(x)
        return nn.Dense(d, dtype=self.dtype, dot_general=_qdg(quant), name="net_2")(h)


class GatedSelfAttention(nn.Module):
    """GLIGEN fuser (reference models/attention.py GatedSelfAttentionDense):
    self-attention over [visual tokens, grounding tokens], added back to the
    visual stream through learnable tanh gates (zero at init)."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, objs):
        n_visual = x.shape[1]
        objs = nn.Dense(x.shape[-1], dtype=self.dtype, name="linear")(objs)
        alpha = self.param("alpha_attn", nn.initializers.zeros, ())
        beta = self.param("alpha_dense", nn.initializers.zeros, ())
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            jnp.concatenate([x, objs.astype(x.dtype)], axis=1))
        attn = CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                              name="attn")(h)[:, :n_visual]
        x = x + jnp.tanh(alpha).astype(x.dtype) * attn
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + jnp.tanh(beta).astype(x.dtype) *             GEGLUFeedForward(dtype=self.dtype, name="ff")(h)
        return x


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    only_cross_attention: bool = False
    use_cross_attention: bool = True
    tome_ratio: float = 0.0
    tome_grid: tuple = ()
    ip_tokens: int = 0
    ip_scale: float = 1.0
    quant: str = None
    attention_type: str = "default"  # "gated" = GLIGEN fuser after attn1
    capture_self_probs: bool = False  # SAG: sow attn1 probs under intermediates
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context=None, gligen_objs=None, extra_kv=None):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(hidden)
        if self.tome_ratio > 0.0 and not self.only_cross_attention and self.tome_grid:
            from ...ops.tome import build_tome

            merge, unmerge = build_tome(h, self.tome_grid[0], self.tome_grid[1],
                                        self.tome_ratio)
            attn_out = CrossAttention(self.num_heads, self.head_dim, dtype=self.dtype,
                                      quant=self.quant, name="attn1")(merge(h))
            hidden = hidden + unmerge(attn_out)
        elif extra_kv is not None:
            # mutual self-attention (AnimateAnyone ReferenceAttentionControl
            # "read", ppdiffusers/models/animate_anyone/
            # mutual_self_attention.py): K/V extend over the reference
            # features; q and all projections are the ordinary attn1 params.
            # A (features, log_weight) tuple additionally biases the extra
            # tokens' logits — softmax(logits + log w) == the FABRIC
            # processor's prob*w renormalization (pipeline_fabric.py:113-117)
            log_w = None
            if isinstance(extra_kv, tuple):
                extra_kv, log_w = extra_kv
            kv = jnp.concatenate([h, extra_kv.astype(h.dtype)], axis=1)
            bias = None
            if log_w is not None:
                bias = jnp.concatenate(
                    [jnp.zeros((h.shape[1],), jnp.float32),
                     jnp.broadcast_to(jnp.asarray(log_w, jnp.float32),
                                      (extra_kv.shape[1],))]
                ).reshape(1, 1, 1, -1)
            hidden = hidden + CrossAttention(
                self.num_heads, self.head_dim, dtype=self.dtype, quant=self.quant,
                name="attn1")(h, kv, bias=bias)
        else:
            hidden = hidden + CrossAttention(
                self.num_heads, self.head_dim, dtype=self.dtype, quant=self.quant,
                capture_self=self.capture_self_probs, name="attn1"
            )(h, context if self.only_cross_attention else None)
        if self.attention_type == "gated" and gligen_objs is not None:
            hidden = GatedSelfAttention(self.num_heads, self.head_dim,
                                        dtype=self.dtype,
                                        name="fuser")(hidden, gligen_objs)
        if self.use_cross_attention:
            h = nn.LayerNorm(dtype=self.dtype, name="norm2")(hidden)
            hidden = hidden + CrossAttention(
                self.num_heads, self.head_dim, ip_tokens=self.ip_tokens,
                ip_scale=self.ip_scale, dtype=self.dtype, quant=self.quant,
                name="attn2"
            )(h, context)
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(hidden)
        hidden = hidden + GEGLUFeedForward(dtype=self.dtype, quant=self.quant,
                                           name="ff")(h)
        return hidden


class _GroupNorm32(nn.Module):
    """Drop-in for nn.GroupNorm routed through ops.norms.group_norm: the
    channel-minor formulation avoids the full-tensor fp32 layout copies XLA
    emits for flax's grouped-reshape reduce (profiled ~10ms/step on SDXL)."""

    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return fused_group_norm(x, scale, bias, self.groups, self.eps, act="none")


class Transformer2DModel(nn.Module):
    """Spatial transformer over NHWC features (proj_in -> blocks -> proj_out)."""

    num_heads: int
    head_dim: int
    num_layers: int = 1
    use_linear_projection: bool = False
    groups: int = 32
    tome_ratio: float = 0.0
    ip_tokens: int = 0
    ip_scale: float = 1.0
    quant: str = None
    attention_type: str = "default"
    capture_self_probs: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, gligen_objs=None, extra_kv=None):
        b, h, w, c = x.shape
        residual = x
        x = _GroupNorm32(self.groups, 1e-6, dtype=self.dtype, name="norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(self.num_heads * self.head_dim, dtype=self.dtype,
                         dot_general=_qdg(self.quant), name="proj_in")(x)
        else:
            x = nn.Conv(self.num_heads * self.head_dim, (1, 1), dtype=self.dtype,
                        conv_general_dilated=_qcg(self.quant), name="proj_in")(x)
            x = x.reshape(b, h * w, self.num_heads * self.head_dim)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(self.num_heads, self.head_dim,
                                      tome_ratio=self.tome_ratio, tome_grid=(h, w),
                                      ip_tokens=self.ip_tokens, ip_scale=self.ip_scale,
                                      quant=self.quant,
                                      attention_type=self.attention_type,
                                      capture_self_probs=self.capture_self_probs,
                                      dtype=self.dtype,
                                      name=f"transformer_blocks_{i}")(
                x, context, gligen_objs=gligen_objs, extra_kv=extra_kv)
        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, dot_general=_qdg(self.quant),
                         name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, self.num_heads * self.head_dim)
            x = nn.Conv(c, (1, 1), dtype=self.dtype,
                        conv_general_dilated=_qcg(self.quant), name="proj_out")(x)
        return x + residual


class AttentionBlock2D(nn.Module):
    """VAE mid-block self-attention over NHWC (diffusers Attention w/
    group_norm, to_q/k/v/to_out)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = _GroupNorm32(self.groups, 1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(x)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(x)
        out = scaled_dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return out.reshape(b, h, w, c) + residual
