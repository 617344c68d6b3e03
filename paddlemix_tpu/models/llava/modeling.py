"""LLaVA (1.5/1.6-style): CLIP tower + mm_projector + Llama, TPU-native.

Rebuild of the reference LLaVA family (paddlemix/models/llava/):
 - token splice `prepare_inputs_labels_for_multimodal` (base_model.py:136) is
   re-designed static-shape: the prompt carries image_token_index placeholders
   (one per vision patch) and a scatter-by-cumsum swaps in projected vision
   features — no dynamic concat, so the whole forward jits.
 - mm_projector mlp2x_gelu -> MMProjector.
 - LlavaCriterion masked LM loss (llava/modeling.py:190-237) -> llava_loss
   (ParallelCrossEntropy + sep-group gather collapse into one masked
   cross-entropy under pjit on TPU).

HF llava-hf torch checkpoints load via convert_foreign_state_dict."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel, convert_torch_state_dict
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.configuration import LlamaConfig
from ..llama.modeling import KVCache, LlamaModule, greedy_generate


@dataclasses.dataclass
class LlavaConfig(BaseConfig):
    model_type = "llava"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    image_token_index: int = 32000
    mm_vision_select_layer: int = -2
    mm_vision_select_feature: str = "patch"  # drop CLS
    mm_projector_type: str = "mlp2x_gelu"
    # "clip" (LLaVA 1.5/1.6) or "siglip" (LLaVA-NeXT-interleave,
    # reference paddlemix/models/llava/siglip_encoder.py)
    vision_tower_type: str = "clip"
    ignore_index: int = -100
    # LLaVA-NeXT anyres (reference base_model.py:136-215 + mm_utils.py:55-181)
    image_aspect_ratio: str = "square"  # "square" | "pad" | "anyres"
    image_grid_pinpoints: Any = ((336, 672), (672, 336), (672, 672),
                                 (1008, 336), (336, 1008))
    mm_patch_merge_type: str = "flat"  # "flat" | "spatial" | "spatial_unpad"

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self):
        if self.vision_tower_type == "siglip":
            from ..siglip import SiglipVisionConfig

            return SiglipVisionConfig.from_dict(
                dict(self.vision_config, use_head=False))
        return CLIPVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(self.text_config)

    @property
    def num_image_tokens(self) -> int:
        v = self.vision
        n = (v.image_size // v.patch_size) ** 2
        if self.vision_tower_type == "siglip":
            return n  # no CLS token to drop
        return n if self.mm_vision_select_feature == "patch" else n + 1


class MMProjector(nn.Module):
    out_dim: int
    projector_type: str = "mlp2x_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.projector_type == "linear":
            return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_0")(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="linear_0")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear_1")(x)


class LlavaModule(nn.Module):
    config: LlavaConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.config.vision_tower_type == "siglip":
            from ..siglip import SiglipVisionTransformer

            self.vision_tower = SiglipVisionTransformer(self.config.vision,
                                                        dtype=self.dtype)
        else:
            self.vision_tower = CLIPVisionTransformer(self.config.vision,
                                                      dtype=self.dtype)
        self.multi_modal_projector = MMProjector(self.config.text.hidden_size,
                                                 self.config.mm_projector_type,
                                                 dtype=self.dtype)
        self.language_model = LlamaModule(self.config.text, dtype=self.dtype)
        if "unpad" in self.config.mm_patch_merge_type:
            # row separator token appended to every unpadded feature row
            # (reference base_model.py:39-47 image_newline)
            d = self.config.text.hidden_size
            self.image_newline = self.param(
                "image_newline", nn.initializers.normal(1.0 / jnp.sqrt(d)), (d,))

    def encode_images(self, pixel_values):
        """(B, H, W, 3) or interleaved (B, N, H, W, 3) ->
        (B, [N*]num_image_tokens, text_hidden)."""
        n_imgs = None
        if pixel_values.ndim == 5:  # multi-image interleave (LLaVA-NeXT)
            b, n_imgs = pixel_values.shape[:2]
            pixel_values = pixel_values.reshape(b * n_imgs,
                                                *pixel_values.shape[2:])
        _, _, hiddens = self.vision_tower(pixel_values, output_hidden_states=True)
        feats = hiddens[self.config.mm_vision_select_layer]
        if (self.config.mm_vision_select_feature == "patch"
                and self.config.vision_tower_type != "siglip"):
            feats = feats[:, 1:]
        feats = self.multi_modal_projector(feats)
        if n_imgs is not None:
            feats = feats.reshape(b, n_imgs * feats.shape[1], -1)
        return feats

    def merge_anyres_features(self, feats, image_size):
        """LLaVA-NeXT anyres merge (reference base_model.py:162-205): tile
        features re-assembled on the padded canvas grid, unpadded back to the
        original aspect, an image_newline column appended per row, prefixed
        by the global-view features. `image_size` is a STATIC (width, height)
        tuple, so every slice below is static-shape under jit; `feats` is
        (1 + n_tiles, patches, d) post-projector."""
        from ...processors.llava_processing import (
            get_anyres_image_grid_shape,
            unpad_hw,
        )

        cfg = self.config
        v = cfg.vision
        side = v.image_size // v.patch_size
        d = feats.shape[-1]
        base, tiles = feats[0], feats[1:]
        if tiles.shape[0] == 0:
            if "unpad" in cfg.mm_patch_merge_type:
                return jnp.concatenate(
                    [base, self.image_newline.astype(base.dtype)[None]], axis=0)
            return base
        nw, nh = get_anyres_image_grid_shape(tuple(image_size),
                                             cfg.image_grid_pinpoints,
                                             v.image_size)
        x = tiles.reshape(nh, nw, side, side, d)
        x = x.transpose(0, 2, 1, 3, 4).reshape(nh * side, nw * side, d)
        if "unpad" in cfg.mm_patch_merge_type:
            ph, hk, pw, wk = unpad_hw(tuple(image_size),
                                      (nh * side, nw * side))
            x = x[ph:ph + hk, pw:pw + wk]
            nl = jnp.broadcast_to(self.image_newline.astype(x.dtype)[None, None],
                                  (hk, 1, d))
            x = jnp.concatenate([x, nl], axis=1).reshape(hk * (wk + 1), d)
        else:
            x = x.reshape(nh * side * nw * side, d)
        return jnp.concatenate([base, x], axis=0)

    def encode_images_anyres(self, pixel_values, image_size):
        """(1 + n_tiles, H, W, 3) crops of ONE image -> (1, T, d)."""
        feats = self.encode_images(pixel_values)
        return self.merge_anyres_features(feats, image_size)[None]

    def splice_image_features(self, input_ids, image_features):
        """Static-shape swap of image placeholder tokens for vision features."""
        token_embeds = self.language_model.embed(input_ids)
        is_img = input_ids == self.config.image_token_index
        feat_idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0,
                            image_features.shape[1] - 1)
        gathered = jnp.take_along_axis(image_features, feat_idx[:, :, None], axis=1)
        return jnp.where(is_img[:, :, None], gathered.astype(token_embeds.dtype), token_embeds)

    def __call__(self, input_ids, pixel_values=None, positions=None, *,
                 segment_ids=None, cache: Optional[KVCache] = None,
                 image_sizes=None):
        if pixel_values is not None:
            if (self.config.image_aspect_ratio == "anyres"
                    and image_sizes is not None):
                image_features = self.encode_images_anyres(
                    pixel_values, tuple(image_sizes[0]))
            else:
                image_features = self.encode_images(pixel_values)
            inputs_embeds = self.splice_image_features(input_ids, image_features)
        else:
            inputs_embeds = None
        return self.language_model(input_ids, positions, inputs_embeds=inputs_embeds,
                                   segment_ids=segment_ids, cache=cache)


class LlavaForConditionalGeneration(PretrainedModel):
    config_class = LlavaConfig
    module_class = LlavaModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        s = config.num_image_tokens + 4
        ids = jnp.full((1, s), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + config.num_image_tokens].set(config.image_token_index)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        """Structural renames first (keeping torch .weight suffixes so the
        layout transpose still applies), then the shared torch->flax pass."""
        renamed = {}
        for k, v in flat.items():
            nk = k
            # llava-hf prefixes
            nk = re.sub(r"^language_model\.model\.", "language_model.", nk)
            nk = re.sub(r"^vision_tower\.vision_model\.", "vision_tower.", nk)
            # legacy llava prefixes ("model.layers", "model.mm_projector")
            nk = re.sub(r"^model\.mm_projector\.0\.", "multi_modal_projector.linear_0.", nk)
            nk = re.sub(r"^model\.mm_projector\.2\.", "multi_modal_projector.linear_1.", nk)
            nk = re.sub(r"^(model\.)?image_newline$", "image_newline", nk)
            nk = re.sub(r"^model\.", "language_model.", nk)
            nk = re.sub(r"^lm_head\.", "language_model.lm_head.", nk)
            nk = re.sub(r"^multi_modal_projector\.linear_1\.",
                        "multi_modal_projector.linear_0.", nk)
            nk = re.sub(r"^multi_modal_projector\.linear_2\.",
                        "multi_modal_projector.linear_1.", nk)
            # vision tower internals (CLIP): encoder.layers -> layers_N, self_attn -> attn
            if nk.startswith("vision_tower."):
                nk = re.sub(r"\.encoder\.layers\.(\d+)\.", r".layers_\1.", nk)
                nk = re.sub(r"\.self_attn\.", r".attn.", nk)
                nk = re.sub(r"\.layer_norm1\.", r".norm1.", nk)
                nk = re.sub(r"\.layer_norm2\.", r".norm2.", nk)
                nk = re.sub(r"\.pre_layrnorm\.", r".pre_layernorm.", nk)
                nk = re.sub(r"\.embeddings\.patch_embedding\.", r".patch_embed.proj.", nk)
                nk = re.sub(r"\.embeddings\.class_embedding$", r".class_embedding", nk)
                nk = re.sub(r"\.embeddings\.position_embedding\.weight$",
                            r".position_embedding", nk)
            else:
                nk = re.sub(r"\.layers\.(\d+)\.", r".layers_\1.", nk)
                nk = re.sub(r"embed_tokens\.weight$", "embed_tokens.embedding", nk)
            renamed[nk] = v
        return convert_torch_state_dict(
            renamed,
            ((r"(layernorm|norm[0-9]?|norm)\.weight$", r"\1.scale"),
             (r"\.weight$", r".kernel")),
        )

    def init_cache(self, batch: int, max_len: int, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)

    def encode_images(self, pixel_values):
        return self.module.apply({"params": self.params}, pixel_values,
                                 method=self.module.encode_images)

    def generate(self, input_ids, pixel_values=None, attention_mask=None,
                 max_new_tokens: int = 32, image_sizes=None, **kwargs):
        """Greedy/sampled generation with the image spliced into the prefill.

        The vision encode + splice runs as ONE jitted program (cached on the
        model) — op-by-op dispatch of a 24-layer ViT would dominate TTFT."""
        inputs_embeds = None
        if (pixel_values is not None
                and self.config.image_aspect_ratio == "anyres"
                and image_sizes is not None):
            # anyres: image_size is static (one compiled program per
            # (pinpoint, original-size) pair — the prefill length already
            # varies with the token count anyway)
            if getattr(self, "_embed_anyres_jit", None) is None:
                def _embed_anyres(params, ids, px, size):
                    feats = self.module.apply(
                        {"params": params}, px, size,
                        method=self.module.encode_images_anyres)
                    return self.module.apply(
                        {"params": params}, ids, feats,
                        method=self.module.splice_image_features)
                self._embed_anyres_jit = jax.jit(_embed_anyres,
                                                 static_argnums=3)
            inputs_embeds = self._embed_anyres_jit(
                self.params, jnp.asarray(input_ids),
                jnp.asarray(pixel_values), tuple(image_sizes[0]))
            pixel_values = None
        if pixel_values is not None:
            if getattr(self, "_embed_jit", None) is None:
                def _embed(params, ids, px):
                    feats = self.module.apply({"params": params}, px,
                                              method=self.module.encode_images)
                    return self.module.apply(
                        {"params": params}, ids, feats,
                        method=self.module.splice_image_features)
                self._embed_jit = jax.jit(_embed)
            inputs_embeds = self._embed_jit(self.params, jnp.asarray(input_ids),
                                            jnp.asarray(pixel_values))
        lm = _LlamaView(self)
        return greedy_generate(lm, input_ids, attention_mask,
                               max_new_tokens=max_new_tokens,
                               inputs_embeds=inputs_embeds, **kwargs)


class _LlamaView:
    """Adapter presenting the inner language model with the surface
    greedy_generate expects (config/params/module/init_cache)."""

    def __init__(self, llava: LlavaForConditionalGeneration):
        self.config = llava.config.text
        self.params = llava.params["language_model"]
        self.module = LlamaModule(self.config, dtype=llava.dtype)
        self.dtype = llava.dtype

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config, batch, max_len, dtype=dtype or self.dtype)


def llava_loss(logits, labels, ignore_index: int = -100):
    """Shifted masked LM loss (reference LlavaCriterion modeling.py:190-237)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, :, None], axis=-1)[:, :, 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)
