"""Shared transformer building blocks for the model zoo.

The reference re-implements attention/MLP/blocks per model family
(clip/eva_clip_model.py, blip2/Qformer.py, llava/clip_encoder.py, ...). Here
one set of flax modules covers encoder towers; decoder LLMs live in
models/llama.py. All attention routes through ops.scaled_dot_product_attention
so every model picks up the Pallas flash kernel on TPU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import get_activation, scaled_dot_product_attention
from ..ops.attention import SegmentIds


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm (same "scale"/"bias" param names) backed by the
    Pallas fused kernel (ops/norms.py). Measured NEGATIVE for the encoder
    hot path on v5e (see EncoderBlock note) — kept for shapes where the
    Pallas kernel wins (large-row LN in the diffusion stacks, TPU_SMOKE)."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.norms import layer_norm

        h = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (h,))
        bias = self.param("bias", nn.initializers.zeros, (h,))
        return layer_norm(x, scale, bias, self.epsilon).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """Self- or cross-attention over (B, S, D) hidden states."""

    num_heads: int
    head_dim: Optional[int] = None
    out_dim: Optional[int] = None
    use_bias: bool = True
    fused_qkv: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context=None, *, mask=None, bias=None, causal=False,
                 segment_ids=None, deterministic=True):
        d_model = hidden.shape[-1]
        context = hidden if context is None else context
        head_dim = self.head_dim or d_model // self.num_heads
        inner = self.num_heads * head_dim
        dense = lambda n, feat: nn.Dense(feat, use_bias=self.use_bias, dtype=self.dtype, name=n)
        if self.fused_qkv and context is hidden:
            qkv = dense("qkv", 3 * inner)(hidden)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = dense("q_proj", inner)(hidden)
            k = dense("k_proj", inner)(context)
            v = dense("v_proj", inner)(context)
        b, sq = q.shape[:2]
        sk = k.shape[1]
        q = q.reshape(b, sq, self.num_heads, head_dim)
        k = k.reshape(b, sk, self.num_heads, head_dim)
        v = v.reshape(b, sk, self.num_heads, head_dim)
        if mask is not None and bias is None:
            bias = jnp.where(mask, 0.0, -1e9)
        attn = scaled_dot_product_attention(
            q, k, v, bias=bias, causal=causal, segment_ids=segment_ids,
            dropout_rate=0.0 if deterministic else self.dropout,
            dropout_rng=None if deterministic else self.make_rng("dropout"),
        )
        attn = attn.reshape(b, sq, inner)
        return nn.Dense(self.out_dim or d_model, use_bias=self.use_bias,
                        dtype=self.dtype, name="out_proj")(attn)


class MLP(nn.Module):
    intermediate_size: int
    activation: str = "gelu"
    out_dim: Optional[int] = None
    use_bias: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        d = self.out_dim or x.shape[-1]
        h = nn.Dense(self.intermediate_size, use_bias=self.use_bias, dtype=self.dtype, name="fc1")(x)
        h = get_activation(self.activation)(h)
        if self.dropout and not deterministic:
            h = nn.Dropout(self.dropout)(h, deterministic=False)
        return nn.Dense(d, use_bias=self.use_bias, dtype=self.dtype, name="fc2")(h)


class EncoderBlock(nn.Module):
    """Pre-LN transformer encoder block (CLIP/ViT/SigLIP style)."""

    num_heads: int
    intermediate_size: int
    activation: str = "gelu"
    eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, mask=None, causal=False, deterministic=True):
        # NOTE: nn.LayerNorm, not the Pallas FusedLayerNorm — measured on v5e
        # (CLIP-B/16 batch 256): pallas LN 0.90 ms vs XLA 0.72 ms standalone
        # at (50432, 768) bf16, and the custom call additionally breaks the
        # residual-add fusion (e2e 162.5 ms vs 138.6 ms/batch).
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        x = x + MultiHeadAttention(
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype, name="attn"
        )(h, mask=mask, causal=causal, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        x = x + MLP(
            intermediate_size=self.intermediate_size, activation=self.activation,
            dropout=self.dropout, dtype=self.dtype, name="mlp",
        )(h, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Image -> patch tokens. NHWC input (TPU-native conv layout)."""

    patch_size: int
    embed_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels):
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(pixels)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)
