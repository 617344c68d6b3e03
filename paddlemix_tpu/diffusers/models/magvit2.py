"""MAGVIT-v2 video tokenizer.

Rebuild of the reference's video tokenizer example (ppdiffusers/examples/
video_tokenizer/magvit2/magvit2.py:804-1070 VideoTokenizer,
lookup_free_quantization.py:53-200 LFQ, finite_scalar_quantization.py FSQ):
a causal 3-D CNN encoder/decoder with interleaved space/time compression and
attention, bottlenecked through a lookup-free (sign-bit) or finite-scalar
quantizer.

TPU-first: NTHWC channels-last throughout; spatial ops fold time into the
batch ((B,T,H,W,C) -> (B*T,H,W,C)) so 2-D convs/attention tile the MXU at
full batch; temporal ops are single lax convs with explicit left padding
(causal) instead of per-frame Python loops; up/down-sampling is
conv + depth-to-space (no transposed convs). The whole encode/decode is
jittable with static shapes."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _rms_norm(x, gamma, scale):
    normed = x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        + 1e-12)
    return (normed * scale * gamma).astype(x.dtype)


class RMSNorm(nn.Module):
    """L2-normalize * sqrt(dim) * gamma (reference magvit2.py:234-259)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (dim,))
        return _rms_norm(x, gamma, dim ** 0.5)


class CausalConv3d(nn.Module):
    """3-D conv over (B,T,H,W,C): time padded on the left only, space SAME
    (reference CausalConv3d, magvit2.py:697-723)."""

    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    time_stride: int = 1

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        time_pad = kt - 1 + (1 - self.time_stride)
        return nn.Conv(
            self.features, (kt, kh, kw), strides=(self.time_stride, 1, 1),
            padding=((time_pad, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
            dtype=x.dtype)(x)


class SqueezeExcite(nn.Module):
    """Attention-pooled per-frame channel gating
    (reference SqueezeExcite, magvit2.py:186-217)."""

    dim_hidden_min: int = 16

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        frames = x.reshape(b * t, h * w, c)
        logits = nn.Dense(1, dtype=x.dtype)(frames)  # to_k 1x1 conv
        context = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        pooled = jnp.einsum("bnk,bnc->bc", context,
                            frames.astype(jnp.float32)).astype(x.dtype)
        hidden = max(self.dim_hidden_min, c // 2)
        g = nn.Dense(hidden, dtype=x.dtype)(pooled)
        g = nn.leaky_relu(g, 0.1)
        g = nn.Dense(c, dtype=x.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.constant(-10.0))(g)
        gates = jax.nn.sigmoid(g).reshape(b, t, 1, 1, c)
        return gates * x


class ResidualUnit(nn.Module):
    """CausalConv3d -> ELU -> 1x1x1 -> ELU -> SE, residual
    (reference ResidualUnit, magvit2.py:725-734)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = CausalConv3d(c, (self.kernel_size,) * 3)(x)
        h = nn.elu(h)
        h = nn.Dense(c, dtype=x.dtype)(h)  # 1x1x1 conv
        h = nn.elu(h)
        h = SqueezeExcite()(h)
        return x + h


class SpatialDownsample2x(nn.Module):
    """Per-frame stride-2 conv (reference magvit2.py:589-608)."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        p = self.kernel_size // 2
        out = nn.Conv(self.features, (self.kernel_size,) * 2, strides=(2, 2),
                      padding=((p, p), (p, p)), dtype=x.dtype)(
            x.reshape(b * t, h, w, c))
        return out.reshape(b, t, h // 2, w // 2, self.features)


class TimeDownsample2x(nn.Module):
    """Causal stride-2 temporal conv. The reference pads kernel_size-1 on
    the left (magvit2.py:611-628), giving ceil(T/2) output frames."""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features, (self.kernel_size, 1, 1), strides=(2, 1, 1),
            padding=((self.kernel_size - 1, 0), (0, 0), (0, 0)),
            dtype=x.dtype)(x)


class SpatialUpsample2x(nn.Module):
    """1x1 conv -> SiLU -> depth-to-space (reference magvit2.py:631-660)."""

    features: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        out = nn.Dense(self.features * 4, dtype=x.dtype)(x)
        out = nn.silu(out)
        out = out.reshape(b, t, h, w, 2, 2, self.features)
        out = out.transpose(0, 1, 2, 4, 3, 5, 6)
        return out.reshape(b, t, h * 2, w * 2, self.features)


class TimeUpsample2x(nn.Module):
    """1x1 conv -> SiLU -> interleave time (reference magvit2.py:663-688)."""

    features: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        out = nn.Dense(self.features * 2, dtype=x.dtype)(x)
        out = nn.silu(out)
        out = out.reshape(b, t, h, w, 2, self.features)
        out = out.transpose(0, 1, 4, 2, 3, 5)
        return out.reshape(b, t * 2, h, w, self.features)


class Attention(nn.Module):
    """Pre-RMSNorm MHA with learned memory kv (reference Attention,
    magvit2.py:295-343). Operates on (B, N, C)."""

    dim_head: int = 32
    heads: int = 8
    causal: bool = False
    num_memory_kv: int = 4

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        inner = self.dim_head * self.heads
        h = RMSNorm()(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=x.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, n, self.heads, self.dim_head)
        v = v.reshape(b, n, self.heads, self.dim_head)
        mem = self.param("mem_kv", nn.initializers.normal(1.0),
                         (2, self.num_memory_kv, self.heads, self.dim_head))
        mk = jnp.broadcast_to(mem[0], (b,) + mem[0].shape).astype(x.dtype)
        mv = jnp.broadcast_to(mem[1], (b,) + mem[1].shape).astype(x.dtype)
        k = jnp.concatenate([mk, k], axis=1)
        v = jnp.concatenate([mv, v], axis=1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits / math.sqrt(self.dim_head)
        if self.causal:
            m = self.num_memory_kv
            qi = jnp.arange(n)[:, None]
            ki = jnp.arange(n + m)[None, :]
            mask = ki >= m + qi + 1  # memory kv always visible
            logits = jnp.where(mask[None, None], -1e30, logits)
        p = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(b, n, inner)
        return nn.Dense(c, use_bias=False, dtype=x.dtype)(out)


class LinearAttention(nn.Module):
    """Softmax-free linear attention (stands in for the reference's
    TaylorSeriesLinearAttn, taylor_series_linear_attention.py — same
    O(N·d²) role at the high-resolution layers)."""

    dim_head: int = 8
    heads: int = 16

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        inner = self.dim_head * self.heads
        h = RMSNorm()(x)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=x.dtype)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = jax.nn.softmax(
            q.reshape(b, n, self.heads, self.dim_head).astype(jnp.float32),
            axis=-1)
        k = jax.nn.softmax(
            k.reshape(b, n, self.heads, self.dim_head).astype(jnp.float32),
            axis=1)
        v = v.reshape(b, n, self.heads, self.dim_head).astype(jnp.float32)
        kv = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bnhd,bhde->bnhe", q, kv).astype(x.dtype)
        return nn.Dense(c, use_bias=False, dtype=x.dtype)(
            out.reshape(b, n, inner))


class FeedForward(nn.Module):
    """GEGLU MLP (reference FeedForward, magvit2.py:401-417)."""

    mult: int = 4

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        inner = int(c * self.mult * 2 / 3)
        h = RMSNorm()(x)
        h = nn.Dense(inner * 2, dtype=x.dtype)(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(g, approximate=False)
        return nn.Dense(c, dtype=x.dtype)(h)


def _space_to_seq(x):
    b, t, h, w, c = x.shape
    return x.reshape(b * t, h * w, c), (b, t, h, w, c)


def _seq_to_space(x, shape):
    b, t, h, w, c = shape
    return x.reshape(b, t, h, w, c)


def _time_to_seq(x):
    b, t, h, w, c = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, c), (b, t, h, w, c)


def _seq_to_time(x, shape):
    b, t, h, w, c = shape
    return x.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)


def _token_shift(x):
    """Half the channels see the previous frame (reference TokenShift,
    magvit2.py:219-231)."""
    keep, shift = jnp.split(x, 2, axis=-1)
    shift = jnp.pad(shift, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))[:, :-1]
    return jnp.concatenate([keep, shift], axis=-1)


class SpaceBlock(nn.Module):
    dim_head: int = 32
    heads: int = 8
    linear: bool = False

    @nn.compact
    def __call__(self, x):
        seq, shape = _space_to_seq(x)
        if self.linear:
            seq = seq + LinearAttention(dim_head=self.dim_head,
                                        heads=self.heads)(seq)
        else:
            seq = seq + Attention(dim_head=self.dim_head, heads=self.heads)(seq)
        seq = seq + FeedForward()(seq)
        return _seq_to_space(seq, shape)


class TimeBlock(nn.Module):
    dim_head: int = 32
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        h = _token_shift(x)
        seq, shape = _time_to_seq(h)
        seq = Attention(dim_head=self.dim_head, heads=self.heads,
                        causal=True)(seq)
        x = x + _seq_to_time(seq, shape)
        h = _token_shift(x)
        seq, shape = _time_to_seq(h)
        seq = FeedForward()(seq)
        return x + _seq_to_time(seq, shape)


# ------------------------------------------------------------- quantizers
class LFQ(nn.Module):
    """Lookup-free quantization: codes are sign bits of the latent
    (reference lookup_free_quantization.py:53-200). Returns
    (quantized, indices, aux_loss, breakdown)."""

    codebook_size: int
    dim: Optional[int] = None
    entropy_loss_weight: float = 0.1
    commitment_loss_weight: float = 1.0
    diversity_gamma: float = 2.5
    inv_temperature: float = 100.0

    @property
    def codebook_dim(self):
        return int(math.log2(self.codebook_size))

    def setup(self):
        assert 2 ** self.codebook_dim == self.codebook_size, \
            "codebook_size must be a power of 2"
        self.has_projections = self.dim is not None \
            and self.dim != self.codebook_dim
        if self.has_projections:
            self.project_in = nn.Dense(self.codebook_dim)
            self.project_out = nn.Dense(self.dim)

    def __call__(self, z, training: bool = False):
        d = self.codebook_dim
        x = z.astype(jnp.float32)
        if self.has_projections:
            x = self.project_in(x)
        quantized = jnp.where(x > 0, 1.0, -1.0)
        # straight-through
        st = x + jax.lax.stop_gradient(quantized - x)
        mask = 2 ** jnp.arange(d - 1, -1, -1)
        indices = jnp.sum((quantized > 0).astype(jnp.int32) * mask, axis=-1)
        if training:
            flat = x.reshape(-1, d)
            codebook = self.codebook()
            distance = -2.0 * flat @ codebook.T
            prob = jax.nn.softmax(-distance * self.inv_temperature, axis=-1)
            per_sample_entropy = jnp.mean(
                -jnp.sum(prob * jnp.log(prob + 1e-9), axis=-1))
            avg_prob = jnp.mean(prob, axis=0)
            codebook_entropy = -jnp.sum(avg_prob * jnp.log(avg_prob + 1e-9))
            entropy_aux = per_sample_entropy \
                - self.diversity_gamma * codebook_entropy
            commit = jnp.mean(jnp.square(
                x - jax.lax.stop_gradient(quantized)))
        else:
            per_sample_entropy = codebook_entropy = jnp.float32(0.0)
            entropy_aux = commit = jnp.float32(0.0)
        out = st
        if self.has_projections:
            out = self.project_out(out)
        aux = entropy_aux * self.entropy_loss_weight \
            + commit * self.commitment_loss_weight
        breakdown = {"per_sample_entropy": per_sample_entropy,
                     "codebook_entropy": codebook_entropy,
                     "commitment": commit}
        return out.astype(z.dtype), indices, aux, breakdown

    def codebook(self):
        d = self.codebook_dim
        codes = jnp.arange(self.codebook_size)
        mask = 2 ** jnp.arange(d - 1, -1, -1)
        bits = ((codes[:, None] & mask) != 0).astype(jnp.float32)
        return bits * 2.0 - 1.0

    def indices_to_codes(self, indices):
        d = self.codebook_dim
        mask = 2 ** jnp.arange(d - 1, -1, -1)
        bits = ((indices[..., None] & mask) != 0).astype(jnp.float32)
        codes = bits * 2.0 - 1.0
        if self.has_projections:
            codes = self.project_out(codes)
        return codes


class FSQ(nn.Module):
    """Finite scalar quantization: per-dim rounding to `levels` grid points
    (reference finite_scalar_quantization.py)."""

    levels: Sequence[int]
    dim: Optional[int] = None

    def setup(self):
        self.has_projections = self.dim is not None \
            and self.dim != len(self.levels)
        if self.has_projections:
            self.project_in = nn.Dense(len(self.levels))
            self.project_out = nn.Dense(self.dim)

    def _bound(self, x):
        """Canonical FSQ bounding: even levels shift by 0.5 so rounding
        lands on integers -L/2..L/2-1; odd levels round to
        -(L-1)/2..(L-1)/2."""
        levels = jnp.asarray(self.levels, jnp.float32)
        half_l = (levels - 1) / 2
        offset = jnp.where(jnp.asarray(self.levels) % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(x + shift) * half_l - offset

    def __call__(self, z, training: bool = False):
        levels = jnp.asarray(self.levels, jnp.float32)
        x = z.astype(jnp.float32)
        if self.has_projections:
            x = self.project_in(x)
        bounded = self._bound(x)
        rounded = jnp.round(bounded)
        st = bounded + jax.lax.stop_gradient(rounded - bounded)
        half_width = jnp.asarray(self.levels, jnp.int32) // 2
        # mixed-radix index
        basis = jnp.concatenate(
            [jnp.ones((1,)), jnp.cumprod(levels[:-1])]).astype(jnp.int32)
        digits = rounded.astype(jnp.int32) + half_width
        indices = jnp.sum(digits * basis, axis=-1)
        out = st / half_width.astype(jnp.float32)
        if self.has_projections:
            out = self.project_out(out)
        zero = jnp.float32(0.0)
        return out.astype(z.dtype), indices, zero, {}

    def indices_to_codes(self, indices):
        levels = jnp.asarray(self.levels, jnp.float32)
        basis = jnp.concatenate(
            [jnp.ones((1,)), jnp.cumprod(levels[:-1])]).astype(jnp.int32)
        digits = (indices[..., None] // basis) % levels.astype(jnp.int32)
        half_width = jnp.asarray(self.levels, jnp.int32) // 2
        codes = (digits - half_width).astype(jnp.float32) \
            / half_width.astype(jnp.float32)
        if self.has_projections:
            codes = self.project_out(codes)
        return codes


# ----------------------------------------------------------- the tokenizer
LayerDef = Union[str, Tuple[str, int]]


class VideoTokenizer(nn.Module):
    """Causal video VAE with a discrete bottleneck
    (reference VideoTokenizer, magvit2.py:804-1260).

    ``layers`` uses the reference's spec strings: residual,
    (consecutive_residual, n), compress_space, compress_time, attend_space,
    linear_attend_space, attend_time. The decoder mirrors the encoder in
    reverse with upsamplers."""

    image_size: int = 64
    layers: Tuple[LayerDef, ...] = ("residual", "residual")
    channels: int = 3
    init_dim: int = 64
    max_dim: int = 2048
    codebook_size: Optional[int] = 1024
    fsq_levels: Optional[Tuple[int, ...]] = None
    residual_conv_kernel_size: int = 3
    input_conv_kernel_size: Tuple[int, int, int] = (7, 7, 7)
    output_conv_kernel_size: Tuple[int, int, int] = (3, 3, 3)
    attn_dim_head: int = 32
    attn_heads: int = 8
    linear_attn_dim_head: int = 8
    linear_attn_heads: int = 16
    lfq_entropy_loss_weight: float = 0.1
    lfq_commitment_loss_weight: float = 1.0
    lfq_diversity_gamma: float = 2.5
    quantizer_aux_loss_weight: float = 1.0
    dtype: Any = jnp.float32

    def setup(self):
        dims = self._plan()["dims"]
        self.conv_in = CausalConv3d(self.init_dim,
                                    self.input_conv_kernel_size)
        enc, dec = [], []
        for i, (layer_def, (dim, dim_out)) in enumerate(
                zip(self.layers, dims)):
            kind, *params = (layer_def,) if isinstance(layer_def, str) \
                else tuple(layer_def)
            if kind == "residual":
                enc.append(ResidualUnit(self.residual_conv_kernel_size))
                dec.append(ResidualUnit(self.residual_conv_kernel_size))
            elif kind == "consecutive_residual":
                (n,) = params
                enc.append([ResidualUnit(self.residual_conv_kernel_size)
                            for _ in range(n)])
                dec.append([ResidualUnit(self.residual_conv_kernel_size)
                            for _ in range(n)])
            elif kind == "compress_space":
                enc.append(SpatialDownsample2x(dim_out))
                dec.append(SpatialUpsample2x(dim))
            elif kind == "compress_time":
                enc.append(TimeDownsample2x(dim_out))
                dec.append(TimeUpsample2x(dim))
            elif kind == "attend_space":
                enc.append(SpaceBlock(self.attn_dim_head, self.attn_heads))
                dec.append(SpaceBlock(self.attn_dim_head, self.attn_heads))
            elif kind == "linear_attend_space":
                enc.append(SpaceBlock(self.linear_attn_dim_head,
                                      self.linear_attn_heads, linear=True))
                dec.append(SpaceBlock(self.linear_attn_dim_head,
                                      self.linear_attn_heads, linear=True))
            elif kind == "attend_time":
                enc.append(TimeBlock(self.attn_dim_head, self.attn_heads))
                dec.append(TimeBlock(self.attn_dim_head, self.attn_heads))
            else:
                raise ValueError(f"unknown layer type {kind!r}")
        self.encoder_layers = enc
        self.decoder_layers = dec
        self.final_norm = nn.LayerNorm()
        self.conv_out = CausalConv3d(self.channels,
                                     self.output_conv_kernel_size)
        latent_dim = self._plan()["latent_dim"]
        if self.fsq_levels is not None:
            assert self.codebook_size is None, \
                "set codebook_size=None when using fsq_levels"
            self.quantizer = FSQ(self.fsq_levels, dim=latent_dim)
        else:
            assert self.codebook_size is not None
            self.quantizer = LFQ(
                codebook_size=self.codebook_size, dim=latent_dim,
                entropy_loss_weight=self.lfq_entropy_loss_weight,
                commitment_loss_weight=self.lfq_commitment_loss_weight,
                diversity_gamma=self.lfq_diversity_gamma)

    def _plan(self):
        """Static layer plan: (dim_in, dim_out) per layer + downsampling."""
        dim = self.init_dim
        fmap = self.image_size
        tdf = 1
        dims = []
        for layer_def in self.layers:
            kind = layer_def if isinstance(layer_def, str) else layer_def[0]
            dim_out = dim
            if kind == "compress_space":
                dim_out = min(dim * 2, self.max_dim)
                fmap //= 2
            elif kind == "compress_time":
                dim_out = min(dim * 2, self.max_dim)
                tdf *= 2
            dims.append((dim, dim_out))
            dim = dim_out
        return {"dims": dims, "fmap_size": fmap,
                "time_downsample_factor": tdf, "latent_dim": dim}

    @property
    def time_downsample_factor(self):
        return self._plan()["time_downsample_factor"]

    @property
    def fmap_size(self):
        return self._plan()["fmap_size"]

    def _run(self, x, layer):
        if isinstance(layer, (list, tuple)):
            for sub in layer:
                x = sub(x)
            return x
        return layer(x)

    def encode(self, video):
        """(B,T,H,W,C) -> latent (B,T',H',W',C'). The first frame survives
        temporal downsampling via front padding of time_downsample_factor-1
        frames (reference encode, magvit2.py:1113-1148)."""
        pad = self.time_downsample_factor - 1
        if (video.shape[1] + pad) % self.time_downsample_factor:
            raise ValueError(
                f"frame count {video.shape[1]} must be 1 mod "
                f"time_downsample_factor={self.time_downsample_factor} "
                f"(e.g. 17 frames for two compress_time layers)")
        video = jnp.pad(video, ((0, 0), (pad, 0), (0, 0), (0, 0), (0, 0)))
        video = self.conv_in(video)
        for layer in self.encoder_layers:
            video = self._run(video, layer)
        return self.final_norm(video)

    def decode(self, quantized):
        x = quantized
        for layer in reversed(self.decoder_layers):
            x = self._run(x, layer)
        video = self.conv_out(x)
        pad = self.time_downsample_factor - 1
        return video[:, pad:]

    def __call__(self, video, training: bool = False, return_codes: bool = False):
        latent = self.encode(video)
        quantized, indices, aux, breakdown = self.quantizer(
            latent, training=training)
        if return_codes:
            return indices
        recon = self.decode(quantized)
        recon_loss = jnp.mean(jnp.square(
            recon.astype(jnp.float32) - video.astype(jnp.float32)))
        total = recon_loss + self.quantizer_aux_loss_weight * aux
        return {"recon": recon, "codes": indices, "loss": total,
                "recon_loss": recon_loss, "aux_loss": aux,
                "breakdown": breakdown}

    def decode_from_code_indices(self, codes):
        """(B, T', H', W') int codes -> video (reference
        decode_from_code_indices, magvit2.py:1151-1163)."""
        quantized = self.quantizer.indices_to_codes(codes)
        return self.decode(quantized.astype(self.dtype))


class FrameDiscriminator(nn.Module):
    """Per-frame patch discriminator for the GAN loss (compact stand-in for
    the reference Discriminator, magvit2.py:478-534)."""

    init_dim: int = 64
    max_dim: int = 512
    num_blocks: int = 4

    @nn.compact
    def __call__(self, video):
        b, t, h, w, c = video.shape
        x = video.reshape(b * t, h, w, c)
        dim = self.init_dim
        for _ in range(self.num_blocks):
            x = nn.Conv(dim, (4, 4), strides=(2, 2), padding="SAME")(x)
            x = nn.leaky_relu(x, 0.1)
            dim = min(dim * 2, self.max_dim)
        x = nn.Conv(1, (3, 3), padding="SAME")(x)
        return x.reshape(b, t, *x.shape[1:3])


def hinge_d_loss(real_logits, fake_logits):
    return jnp.mean(nn.relu(1.0 - real_logits)) \
        + jnp.mean(nn.relu(1.0 + fake_logits))


def hinge_g_loss(fake_logits):
    return -jnp.mean(fake_logits)
