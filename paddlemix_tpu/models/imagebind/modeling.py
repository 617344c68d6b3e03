"""ImageBind: joint embedding across vision / text / audio / depth / thermal / IMU.

Rebuild of the reference ImageBind (paddlemix/models/imagebind/modeling.py,
2971 LoC): per-modality preprocessor stem -> transformer trunk -> head into a
shared embedding space with per-modality logit scales. One generic trunk
serves every modality; stems differ (patch conv for image/depth/thermal,
mel-patch conv for audio, token embedding for text, 1D conv for IMU)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ..layers import EncoderBlock

MODALITIES = ("vision", "text", "audio", "depth", "thermal", "imu")


@dataclasses.dataclass
class ModalityConfig(BaseConfig):
    model_type = "imagebind_modality"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    # stem parameters (interpretation depends on modality)
    input_size: int = 224      # image hw / audio mel frames / text max len / imu seq
    patch_size: int = 16
    in_channels: int = 3
    vocab_size: int = 49408    # text only
    causal: bool = False       # text trunk is causal


@dataclasses.dataclass
class ImageBindConfig(BaseConfig):
    model_type = "imagebind"
    embed_dim: int = 1024
    modality_configs: Optional[Dict[str, Dict[str, Any]]] = None

    def __post_init__(self):
        defaults = {
            "vision": dict(in_channels=3),
            "text": dict(causal=True, in_channels=0),
            "audio": dict(in_channels=1, input_size=128),
            "depth": dict(in_channels=1),
            "thermal": dict(in_channels=1),
            "imu": dict(in_channels=6, input_size=2000, patch_size=8),
        }
        cfgs = self.modality_configs or {}
        self.modality_configs = {m: dict(defaults[m], **cfgs.get(m, {}))
                                 for m in (cfgs.keys() or defaults.keys())}

    def modality(self, name: str) -> ModalityConfig:
        return ModalityConfig.from_dict(self.modality_configs[name])


class ModalityEncoder(nn.Module):
    name_: str
    config: ModalityConfig
    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        m = self.name_
        if m == "text":
            h = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="token_embedding")(x)
            pos = self.param("pos_embed", nn.initializers.normal(0.01),
                             (cfg.input_size, cfg.hidden_size))
            h = h + pos[None, : h.shape[1]].astype(h.dtype)
        elif m == "imu":
            # (B, T, 6) -> strided 1D conv patches
            h = nn.Conv(cfg.hidden_size, (cfg.patch_size,), strides=(cfg.patch_size,),
                        dtype=self.dtype, name="stem")(x)
        else:
            # (B, H, W, C) image-like (audio = mel spectrogram image)
            h = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                        strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                        dtype=self.dtype, name="stem")(x)
            b, gh, gw, c = h.shape
            h = h.reshape(b, gh * gw, c)
            pos = self.param("pos_embed", nn.initializers.normal(0.01),
                             (h.shape[1], cfg.hidden_size))
            h = h + pos[None].astype(h.dtype)
        if m != "text":
            cls = self.param("cls_token", nn.initializers.normal(0.01), (cfg.hidden_size,))
            h = jnp.concatenate(
                [jnp.broadcast_to(cls, (h.shape[0], 1, cfg.hidden_size)).astype(h.dtype), h],
                axis=1)
        for i in range(cfg.num_hidden_layers):
            h = EncoderBlock(cfg.num_attention_heads, cfg.intermediate_size,
                             activation="gelu", dtype=self.dtype,
                             name=f"blocks_{i}")(h, causal=cfg.causal,
                                                 deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm")(h)
        if m == "text":
            eos_pos = jnp.argmax(x, axis=-1) * 0 + (x != 0).sum(-1) - 1  # last non-pad
            pooled = h[jnp.arange(h.shape[0]), jnp.maximum(eos_pos, 0)]
        else:
            pooled = h[:, 0]
        out = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="head")(pooled)
        # per-modality learnable scale (reference applies it post-normalize)
        scale = self.param("logit_scale", nn.initializers.constant(
            {"vision": 0.0, "text": 0.0}.get(m, 1.6)), ())
        out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        return out * jnp.exp(scale).astype(out.dtype)


class ImageBindModule(nn.Module):
    config: ImageBindConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoders = {
            m: ModalityEncoder(m, self.config.modality(m), self.config.embed_dim,
                               dtype=self.dtype, name=f"modality_{m}")
            for m in self.config.modality_configs
        }

    def encode(self, modality: str, x):
        return self.encoders[modality](x)

    def __call__(self, inputs: Dict[str, jnp.ndarray]):
        return {m: self.encoders[m](x) for m, x in inputs.items()}


class ImageBindModel(PretrainedModel):
    config_class = ImageBindConfig
    module_class = ImageBindModule

    @classmethod
    def example_inputs(cls, config):
        inputs = {}
        for m in config.modality_configs:
            c = config.modality(m)
            if m == "text":
                inputs[m] = jnp.ones((1, 8), jnp.int32)
            elif m == "imu":
                inputs[m] = jnp.zeros((1, c.input_size, c.in_channels))
            else:
                s = min(c.input_size, 32) if m != "audio" else c.input_size
                inputs[m] = jnp.zeros((1, c.input_size, c.input_size, c.in_channels))
        return (inputs,), {}

    def encode(self, modality: str, x):
        return self.module.apply({"params": self.params}, modality, x,
                                 method=self.module.encode)
