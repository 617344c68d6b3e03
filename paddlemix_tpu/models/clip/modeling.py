"""CLIP dual towers, TPU-native.

Rebuild of the reference's contrastive stack:
 - EVA-CLIP model (reference paddlemix/models/clip/eva_clip_model.py) — here the
   towers are plain flax modules sharded by PartitionSpec rules instead of
   ColumnParallelLinear (reference blip2/eva_vit.py:80,140).
 - distributed contrastive loss with differentiable feature gathering
   (reference paddlemix/models/clip/loss.py:53-98 gather_features +
   models/common/distributed_utils.py:19-44 AllGather PyLayer) — on TPU this is
   jax.lax.all_gather(..., tiled=True) inside pjit; gradients flow natively.
 - HF/ppdiffusers CLIP text/vision encoders (reference
   ppdiffusers/transformers/clip/modeling.py) — same module doubles as the SD
   text encoder; from_pretrained accepts HF torch checkpoints.

Layout: pixel inputs are NHWC (TPU conv layout); HF NCHW checkpoints convert at
load time (conv OIHW->HWIO handled in core.modeling)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.modeling import PretrainedModel
from ..layers import EncoderBlock, PatchEmbed
from .configuration import CLIPConfig, CLIPTextConfig, CLIPVisionConfig

# torch/HF checkpoint key renames (applied via core.modeling regex machinery)
_CLIP_KEY_MAP = (
    (r"^text_model\.embeddings\.token_embedding\.weight$", r"text_model.token_embedding.embedding"),
    (r"^text_model\.embeddings\.position_embedding\.weight$", r"text_model.position_embedding"),
    (r"^vision_model\.embeddings\.patch_embedding\.weight$", r"vision_model.patch_embed.proj.kernel"),
    (r"^vision_model\.embeddings\.class_embedding$", r"vision_model.class_embedding"),
    (r"^vision_model\.embeddings\.position_embedding\.weight$", r"vision_model.position_embedding"),
    (r"\.encoder\.layers\.(\d+)\.", r".layers_\1."),
    (r"\.self_attn\.", r".attn."),
    (r"\.layer_norm1\.", r".norm1."),
    (r"\.layer_norm2\.", r".norm2."),
    (r"\.pre_layrnorm\.", r".pre_layernorm."),
    (r"\.post_layernorm\.", r".post_layernorm."),
    (r"\.final_layer_norm\.", r".final_layer_norm."),
    (r"(norm[^.]*|norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class CLIPVisionTransformer(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values, deterministic=True, output_hidden_states=False):
        cfg = self.config
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        x = PatchEmbed(cfg.patch_size, cfg.hidden_size, use_bias=cfg.patch_bias,
                       dtype=self.dtype, name="patch_embed")(pixel_values)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,))
        cls = jnp.broadcast_to(cls, (x.shape[0], 1, cfg.hidden_size)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_patches + 1, cfg.hidden_size))
        x = x + pos[None].astype(x.dtype)
        if cfg.use_pre_layernorm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name="pre_layernorm")(x)
        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = EncoderBlock(
                num_heads=cfg.num_attention_heads,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.hidden_act,
                eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
            hidden_states.append(x)
        post_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                               name="post_layernorm")
        if cfg.post_layernorm_full:
            x = post_ln(x)
            pooled = x[:, 0]
        else:
            pooled = post_ln(x[:, 0])
        if output_hidden_states:
            return x, pooled, tuple(hidden_states)
        return x, pooled


class CLIPTextTransformer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, deterministic=True, output_hidden_states=False):
        cfg = self.config
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (cfg.max_position_embeddings, cfg.hidden_size))
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        hidden_states = [x]
        # CLIP text tower is causal (reference ppdiffusers/transformers/clip)
        for i in range(cfg.num_hidden_layers):
            x = EncoderBlock(
                num_heads=cfg.num_attention_heads,
                intermediate_size=cfg.intermediate_size,
                activation=cfg.hidden_act,
                eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, causal=True, deterministic=deterministic)
            hidden_states.append(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(x)
        # pool at eos: highest-id token (HF convention: argmax of eos matches)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eos_pos]
        if output_hidden_states:
            return x, pooled, tuple(hidden_states)
        return x, pooled


class CLIPModule(nn.Module):
    config: CLIPConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_model = CLIPVisionTransformer(self.config.vision, dtype=self.dtype)
        self.text_model = CLIPTextTransformer(self.config.text, dtype=self.dtype)
        self.visual_projection = nn.Dense(self.config.projection_dim, use_bias=False,
                                          dtype=self.dtype)
        self.text_projection = nn.Dense(self.config.projection_dim, use_bias=False,
                                        dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(self.config.logit_scale_init_value), ())

    def encode_image(self, pixel_values, deterministic=True):
        _, pooled = self.vision_model(pixel_values, deterministic=deterministic)
        return self.visual_projection(pooled)

    def encode_text(self, input_ids, deterministic=True):
        _, pooled = self.text_model(input_ids, deterministic=deterministic)
        return self.text_projection(pooled)

    def __call__(self, pixel_values, input_ids, deterministic=True, normalize=True):
        img = self.encode_image(pixel_values, deterministic=deterministic)
        txt = self.encode_text(input_ids, deterministic=deterministic)
        if normalize:
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img, txt, jnp.exp(self.logit_scale)


class CLIPModel(PretrainedModel):
    config_class = CLIPConfig
    module_class = CLIPModule
    torch_key_map = _CLIP_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        return (jnp.zeros((1, v.image_size, v.image_size, 3)),
                jnp.zeros((1, 4), jnp.int32)), {}

    def encode_image(self, pixel_values):
        return self.module.apply({"params": self.params}, pixel_values,
                                 method=self.module.encode_image)

    def encode_text(self, input_ids):
        return self.module.apply({"params": self.params}, input_ids,
                                 method=self.module.encode_text)


class CLIPTextModel(PretrainedModel):
    """Standalone text encoder (SD/SDXL text tower)."""

    config_class = CLIPTextConfig
    torch_key_map = tuple(
        (p.replace("^text_model\\.", "^"), r.replace("text_model.", ""))
        for p, r in _CLIP_KEY_MAP
    )

    class _Module(nn.Module):
        config: CLIPTextConfig
        dtype: jnp.dtype = jnp.float32

        def setup(self):
            self.text_model = CLIPTextTransformer(self.config, dtype=self.dtype)

        def __call__(self, input_ids, deterministic=True, output_hidden_states=False):
            return self.text_model(input_ids, deterministic=deterministic,
                                   output_hidden_states=output_hidden_states)

    module_class = _Module

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 4), jnp.int32),), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        from ...core.modeling import convert_torch_state_dict

        flat = {
            ("text_model." + k if not k.startswith("text_model.") else k): v
            for k, v in flat.items()
            if not k.startswith("text_projection")
        }
        return convert_torch_state_dict(flat, _CLIP_KEY_MAP)


class CLIPTextModelWithProjection(PretrainedModel):
    """Text tower + projection head (SDXL's second text encoder)."""

    config_class = CLIPTextConfig
    torch_key_map = _CLIP_KEY_MAP

    class _Module(nn.Module):
        config: CLIPTextConfig
        dtype: jnp.dtype = jnp.float32

        def setup(self):
            self.text_model = CLIPTextTransformer(self.config, dtype=self.dtype)
            self.text_projection = nn.Dense(self.config.projection_dim, use_bias=False,
                                            dtype=self.dtype)

        def __call__(self, input_ids, deterministic=True, output_hidden_states=False):
            out = self.text_model(input_ids, deterministic=deterministic,
                                  output_hidden_states=output_hidden_states)
            pooled = self.text_projection(out[1])
            if output_hidden_states:
                return out[0], pooled, out[2]
            return out[0], pooled

    module_class = _Module

    @classmethod
    def example_inputs(cls, config):
        return (jnp.zeros((1, 4), jnp.int32),), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        from ...core.modeling import convert_torch_state_dict

        flat = {
            (k if k.startswith(("text_model.", "text_projection")) else "text_model." + k): v
            for k, v in flat.items()
        }
        return convert_torch_state_dict(flat, _CLIP_KEY_MAP)


def clip_contrastive_loss(image_feats, text_feats, logit_scale, axis_name: Optional[str] = None):
    """InfoNCE with optional cross-device feature gathering.

    Inside pjit/shard_map with a named batch axis, gathers features from all
    devices (differentiably — XLA handles the grad splice the reference builds
    by hand in clip/loss.py:53-98) and offsets labels by this device's shard."""
    if axis_name is not None:
        all_img = jax.lax.all_gather(image_feats, axis_name, tiled=True)
        all_txt = jax.lax.all_gather(text_feats, axis_name, tiled=True)
        idx = jax.lax.axis_index(axis_name)
        labels = jnp.arange(image_feats.shape[0]) + idx * image_feats.shape[0]
    else:
        all_img, all_txt = image_feats, text_feats
        labels = jnp.arange(image_feats.shape[0])
    logits_i = logit_scale * image_feats @ all_txt.T
    logits_t = logit_scale * text_feats @ all_img.T
    loss_i = -jnp.mean(jax.nn.log_softmax(logits_i, axis=-1)[jnp.arange(len(labels)), labels])
    loss_t = -jnp.mean(jax.nn.log_softmax(logits_t, axis=-1)[jnp.arange(len(labels)), labels])
    return 0.5 * (loss_i + loss_t)
