"""T5 encoder (SD3's third text tower; FlanT5 for BLIP-2).

Rebuild of the reference's T5 port (ppdiffusers/ppdiffusers/transformers/t5/
modeling.py, 1901 LoC — encoder side): relative position bias buckets,
T5LayerNorm (rms, no bias), gated-gelu or relu MLP, no biases anywhere.
HF t5/flan-t5 torch checkpoints load via the key map."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import rms_norm, scaled_dot_product_attention


@dataclasses.dataclass
class T5Config(BaseConfig):
    model_type = "t5"
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dense_act_fn: str = "gelu_new"
    is_gated_act: bool = True
    feed_forward_proj: str = "gated-gelu"

    def __post_init__(self):
        # HF encodes activation in feed_forward_proj
        if self.feed_forward_proj.startswith("gated-"):
            self.is_gated_act = True
            self.dense_act_fn = {"gated-gelu": "gelu_new", "gated-silu": "silu"}[
                self.feed_forward_proj]
        elif self.feed_forward_proj == "relu":
            self.is_gated_act = False
            self.dense_act_fn = "relu"


def relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket function (encoder)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        return rms_norm(x, scale.astype(jnp.float32), self.eps).astype(self.dtype)


class T5Attention(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        cfg = self.config
        b, s, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.num_heads, cfg.d_kv)

        if position_bias is None and self.has_relative_bias:
            pos = jnp.arange(s)
            rel = pos[None, :] - pos[:, None]
            buckets = relative_position_bucket(
                rel, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance)
            bias_table = nn.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                                  dtype=self.dtype, name="relative_attention_bias")
            position_bias = bias_table(buckets).transpose(2, 0, 1)[None]  # (1,H,S,S)
        if position_bias is None:
            position_bias = jnp.zeros((1, cfg.num_heads, s, s), jnp.float32)
        bias = position_bias
        if mask is not None:
            bias = bias + jnp.where(mask[:, None, None, :], 0.0, -1e9)
        # T5 does NOT scale by 1/sqrt(d)
        out = scaled_dot_product_attention(q, k, v, bias=bias, scale=1.0)
        out = out.reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(out), position_bias


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias=None, mask=None):
        cfg = self.config
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="attn_norm")(x)
        attn, position_bias = T5Attention(cfg, self.has_relative_bias, dtype=self.dtype,
                                          name="attention")(h, position_bias, mask)
        x = x + attn
        h = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="mlp_norm")(x)
        from ...ops import get_activation

        act = get_activation(cfg.dense_act_fn)
        if cfg.is_gated_act:
            wi0 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
            wi1 = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
            h = act(wi0) * wi1
        else:
            h = act(nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi")(h))
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x, position_bias


class T5EncoderModule(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype, name="shared")(input_ids)
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = T5Block(cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                                       name=f"block_{i}")(x, position_bias, attention_mask)
        x = T5LayerNorm(cfg.layer_norm_epsilon, dtype=self.dtype, name="final_layer_norm")(x)
        return x, x.mean(axis=1)


_T5_KEY_MAP = (
    (r"^encoder\.embed_tokens\.weight$", r"shared.embedding"),
    (r"^shared\.weight$", r"shared.embedding"),
    (r"^encoder\.block\.(\d+)\.layer\.0\.SelfAttention\.", r"block_\1.attention."),
    (r"^encoder\.block\.(\d+)\.layer\.0\.layer_norm\.", r"block_\1.attn_norm."),
    (r"^encoder\.block\.(\d+)\.layer\.1\.DenseReluDense\.", r"block_\1."),
    (r"^encoder\.block\.(\d+)\.layer\.1\.layer_norm\.", r"block_\1.mlp_norm."),
    (r"^encoder\.final_layer_norm\.", r"final_layer_norm."),
    (r"relative_attention_bias\.weight$", r"relative_attention_bias.embedding"),
    (r"(_norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class T5EncoderModel(PretrainedModel):
    config_class = T5Config
    module_class = T5EncoderModule
    torch_key_map = _T5_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 4), jnp.int32),), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        from ...core.modeling import convert_torch_state_dict

        flat = {k: v for k, v in flat.items()
                if not k.startswith(("decoder.", "lm_head."))}
        return convert_torch_state_dict(flat, cls.torch_key_map)
