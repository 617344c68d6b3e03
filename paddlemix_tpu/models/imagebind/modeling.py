"""ImageBind: joint embedding across vision / text / audio / depth / thermal / IMU.

Rebuild of the reference ImageBind (paddlemix/models/imagebind/modeling.py,
2971 LoC + multimodal_preprocessors.py + helpers.py), with the real
per-modality preprocessor stems:

 - vision: PadIm2Video (images repeated to 2 frames) + biasless Conv3D
   (2,14,14) spatio-temporal patches (:187-205);
 - text: CLIP-style token+pos embedding, causal trunk, EOS(argmax) pooling
   (:206-211, SelectEOSAndProject);
 - audio: OVERLAPPING Conv2D kernel 16 / stride 10 over a 128x204 log-mel
   "image", then LayerNorm (:212-234);
 - depth / thermal: biasless 16x16 Conv2D + LayerNorm (:235-281);
 - imu: 8-sample channel-flattened chunks -> Linear(48, d, no bias) + LN
   (:282-297, IMUPreprocessor);

heads = LayerNorm -> cls/EOS select -> biasless Linear into the shared space
(:412-497), postprocessors = L2-normalize + per-modality logit scaling
(learnable for text, fixed 20/5/10/5 for audio/depth/thermal/imu; :499-522,
helpers.py:40-60 LearnableLogitScaling)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import numpy as np
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
    input_size: int = 224      # image hw / audio target_len / text ctx / imu seq
    patch_size: int = 16       # conv kernel (and stride unless stride set)
    stride: Optional[int] = None
    in_channels: int = 3
    video_frames: int = 2      # vision: PadIm2Video repeat count
    num_mel_bins: int = 128    # audio mel axis
    stem_norm: bool = False    # audio/depth/thermal/imu: LN after stem
    vocab_size: int = 49408    # text only
    causal: bool = False       # text trunk is causal
    logit_scale_init: float = 1.0
    logit_scale_learnable: bool = False


@dataclasses.dataclass
class ImageBindConfig(BaseConfig):
    model_type = "imagebind"
    embed_dim: int = 1024
    modality_configs: Optional[Dict[str, Dict[str, Any]]] = None

    def __post_init__(self):
        # imagebind_huge geometry (reference modeling.py:70-160 defaults)
        defaults = {
            "vision": dict(in_channels=3, patch_size=14, video_frames=2),
            "text": dict(causal=True, in_channels=0, input_size=77,
                         logit_scale_init=1 / 0.07,
                         logit_scale_learnable=True),
            "audio": dict(in_channels=1, input_size=204, num_mel_bins=128,
                          patch_size=16, stride=10, stem_norm=True,
                          logit_scale_init=20.0),
            "depth": dict(in_channels=1, stem_norm=True, logit_scale_init=5.0),
            "thermal": dict(in_channels=1, stem_norm=True,
                            logit_scale_init=10.0),
            "imu": dict(in_channels=6, input_size=2000, patch_size=8,
                        stem_norm=True, logit_scale_init=5.0),
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
            token_ids = x
            h = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="token_embedding")(x)
            pos = self.param("pos_embed", nn.initializers.normal(0.01),
                             (cfg.input_size, cfg.hidden_size))
            h = h + pos[None, : h.shape[1]].astype(h.dtype)
        elif m == "imu":
            # (B, T, 6) -> 8-sample chunks, channels flattened -> Linear(48,d)
            # (reference IMUPreprocessor: unfold(kernel=8) over the signal)
            b, t, c = x.shape
            k = cfg.patch_size
            chunks = x.reshape(b, t // k, k, c).reshape(b, t // k, k * c)
            h = nn.Dense(cfg.hidden_size, use_bias=False, dtype=self.dtype,
                         name="stem")(chunks)
            if cfg.stem_norm:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="stem_norm")(h)
        elif m == "vision":
            # image (B,H,W,3) or video (B,T,H,W,3); images repeat to
            # video_frames (PadIm2Video pad_type="repeat"), then biasless
            # Conv3D (T,ph,pw) spatio-temporal patches
            if x.ndim == 4:
                x = jnp.repeat(x[:, None], cfg.video_frames, axis=1)
            p = cfg.patch_size
            h = nn.Conv(cfg.hidden_size, (cfg.video_frames, p, p),
                        strides=(cfg.video_frames, p, p), padding="VALID",
                        use_bias=False, dtype=self.dtype, name="stem")(x)
            b = h.shape[0]
            h = h.reshape(b, -1, cfg.hidden_size)
        else:
            # audio mel "image" / depth / thermal: (B, H, W, C) conv stem,
            # audio's stride (10) overlaps its kernel (16)
            p = cfg.patch_size
            s = cfg.stride or p
            h = nn.Conv(cfg.hidden_size, (p, p), strides=(s, s),
                        padding="VALID", use_bias=False, dtype=self.dtype,
                        name="stem")(x)
            b, gh, gw, c = h.shape
            h = h.reshape(b, gh * gw, c)
            if cfg.stem_norm:
                h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="stem_norm")(h)
        if m != "text":
            cls = self.param("cls_token", nn.initializers.normal(0.01),
                             (cfg.hidden_size,))
            h = jnp.concatenate(
                [jnp.broadcast_to(cls, (h.shape[0], 1, cfg.hidden_size)).astype(h.dtype), h],
                axis=1)
            pos = self.param("pos_embed", nn.initializers.normal(0.01),
                             (h.shape[1], cfg.hidden_size))
            h = h + pos[None].astype(h.dtype)
        for i in range(cfg.num_hidden_layers):
            h = EncoderBlock(cfg.num_attention_heads, cfg.intermediate_size,
                             activation="gelu", dtype=self.dtype,
                             name=f"blocks_{i}")(h, causal=cfg.causal,
                                                 deterministic=deterministic)
        # head: LN -> select cls/EOS -> biasless Linear (reference :412-497)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        if m == "text":
            # CLIP-style: EOS token = per-row argmax of token ids
            eos_pos = jnp.argmax(token_ids, axis=-1)
            pooled = h[jnp.arange(h.shape[0]), eos_pos]
        else:
            pooled = h[:, 0]
        out = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                       name="head")(pooled)
        # postprocess: normalize + logit scaling (vision scale == 1)
        out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
        if cfg.logit_scale_learnable:
            log_scale = self.param(
                "log_logit_scale",
                nn.initializers.constant(float(np.log(cfg.logit_scale_init))),
                ())
            out = out * jnp.exp(log_scale).astype(out.dtype)
        elif cfg.logit_scale_init != 1.0:
            out = out * jnp.asarray(cfg.logit_scale_init, out.dtype)
        return out


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
            elif m == "audio":
                inputs[m] = jnp.zeros((1, c.num_mel_bins, c.input_size,
                                       c.in_channels))
            else:
                inputs[m] = jnp.zeros((1, c.input_size, c.input_size,
                                       c.in_channels))
        return (inputs,), {}

    def encode(self, modality: str, x):
        return self.module.apply({"params": self.params}, modality, x,
                                 method=self.module.encode)
