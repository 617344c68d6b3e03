"""InternVL2 chat model: InternViT + pixel-unshuffle MLP projector + LLM.

Rebuild of the reference (paddlemix/models/internvl2/modeling_internvl_chat.py
399 LoC + modeling_intern_vit.py): dynamic tiling happens in the processor
(processors/internvl_processing.py); tiles run the ViT as a batch, features
pixel-unshuffle 2x2 -> mlp1 -> spliced at image-token positions (same
static-shape cumsum scatter as LLaVA). LLM = Qwen2/Llama via models.llama;
InternLM2/Phi3 variants map onto the same decoder with their key maps."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ..llama.configuration import LlamaConfig
from ..llama.modeling import KVCache, LlamaModule
from .intern_vit import InternVisionConfig, InternVisionModel


@dataclasses.dataclass
class InternVLChatConfig(BaseConfig):
    model_type = "internvl_chat"
    vision_config: Optional[Dict[str, Any]] = None
    llm_config: Optional[Dict[str, Any]] = None
    downsample_ratio: float = 0.5
    select_layer: int = -1
    img_context_token_id: int = 151667
    ps_version: str = "v2"

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.llm_config = self.llm_config or {}

    @property
    def vision(self) -> InternVisionConfig:
        return InternVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(self.llm_config)

    @property
    def tokens_per_tile(self) -> int:
        v = self.vision
        grid = v.image_size // v.patch_size
        r = int(1 / self.downsample_ratio)
        return (grid // r) ** 2


def pixel_shuffle(x, scale_factor: float = 0.5, ps_version: str = "v2"):
    """(B, H, W, C) -> (B, H*s, W*s, C/s^2) with s<1 = unshuffle (reference
    modeling_internvl_chat.pixel_shuffle)."""
    b, h, w, c = x.shape
    r = int(1 / scale_factor)
    x = x.reshape(b, h, w // r, c * r)
    if ps_version == "v2":
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, w // r, h // r, c * r * r)
        x = x.transpose(0, 2, 1, 3)
    else:
        x = x.reshape(b, h // r, w // r, c * r * r)
    return x


class InternVLChatModule(nn.Module):
    config: InternVLChatConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.vision_model = InternVisionModel(cfg.vision, dtype=self.dtype)
        v = cfg.vision
        r = int(1 / cfg.downsample_ratio)
        in_dim = v.hidden_size * r * r
        self.mlp1_ln = nn.LayerNorm(dtype=self.dtype)
        self.mlp1_fc1 = nn.Dense(cfg.text.hidden_size, dtype=self.dtype)
        self.mlp1_fc2 = nn.Dense(cfg.text.hidden_size, dtype=self.dtype)
        self.language_model = LlamaModule(cfg.text, dtype=self.dtype)

    def extract_feature(self, pixel_values):
        """(T, H, W, 3) tiles -> (T, tokens_per_tile, llm_dim)."""
        cfg = self.config
        hiddens_needed = cfg.select_layer != -1
        if hiddens_needed:
            _, _, hiddens = self.vision_model(pixel_values, output_hidden_states=True)
            feats = hiddens[cfg.select_layer]
        else:
            feats, _, _ = self.vision_model(pixel_values)
        feats = feats[:, 1:]  # drop CLS
        t = feats.shape[0]
        g = int(feats.shape[1] ** 0.5)
        feats = feats.reshape(t, g, g, -1)
        feats = pixel_shuffle(feats, cfg.downsample_ratio, cfg.ps_version)
        feats = feats.reshape(t, -1, feats.shape[-1])
        h = self.mlp1_fc1(self.mlp1_ln(feats))
        return self.mlp1_fc2(nn.gelu(h, approximate=False))

    def splice(self, input_ids, tile_features, tile_mask=None):
        """tile_features: (T, N, D) -> flattened rows fill image-token slots."""
        token_embeds = self.language_model.embed(input_ids)
        feats = tile_features.reshape(1, -1, tile_features.shape[-1])
        is_img = input_ids == self.config.img_context_token_id
        idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0,
                       feats.shape[1] - 1)
        gathered = jnp.take_along_axis(
            jnp.broadcast_to(feats, (input_ids.shape[0], *feats.shape[1:])),
            idx[:, :, None], axis=1)
        return jnp.where(is_img[:, :, None], gathered.astype(token_embeds.dtype),
                         token_embeds)

    def __call__(self, input_ids, pixel_values=None, positions=None, *,
                 segment_ids=None, cache: Optional[KVCache] = None, tile_mask=None):
        inputs_embeds = None
        if pixel_values is not None:
            feats = self.extract_feature(pixel_values)
            inputs_embeds = self.splice(input_ids, feats, tile_mask)
        return self.language_model(input_ids, positions, inputs_embeds=inputs_embeds,
                                   segment_ids=segment_ids, cache=cache)


_INTERNVL_KEY_MAP = (
    # InternViT (HF vision_model.embeddings/encoder tree -> flat flax tower)
    (r"^vision_model\.embeddings\.", r"vision_model."),
    (r"^vision_model\.encoder\.layers\.(\d+)\.", r"vision_model.layers_\1."),
    (r"\.mlp\.fc1\.", r".fc1."),
    (r"\.mlp\.fc2\.", r".fc2."),
    (r"(q_norm|k_norm|norm1|norm2)\.weight$", r"\1.scale"),
    # mlp1 projector Sequential (LN, Linear, GELU, Linear)
    (r"^mlp1\.0\.weight$", r"mlp1_ln.scale"),
    (r"^mlp1\.0\.bias$", r"mlp1_ln.bias"),
    (r"^mlp1\.1\.", r"mlp1_fc1."),
    (r"^mlp1\.3\.", r"mlp1_fc2."),
    # LLM renames:
    (r"^language_model\.model\.", r"language_model."),
    (r"language_model\.embed_tokens\.weight$", r"language_model.embed_tokens.embedding"),
    (r"language_model\.tok_embeddings\.weight$", r"language_model.embed_tokens.embedding"),
    (r"\.layers\.(\d+)\.", r".layers_\1."),
    # InternLM2 naming (reference paddlemix/models/internvl2/internlm2/
    # modeling_internlm2.py): attention.wo/feed_forward.w1/w3/w2,
    # attention_norm/ffn_norm -> llama-style module names
    (r"\.attention\.wo\.", r".self_attn.o_proj."),
    (r"\.feed_forward\.w1\.", r".mlp.gate_proj."),
    (r"\.feed_forward\.w3\.", r".mlp.up_proj."),
    (r"\.feed_forward\.w2\.", r".mlp.down_proj."),
    (r"\.attention_norm\.", r".input_layernorm."),
    (r"\.ffn_norm\.", r".post_attention_layernorm."),
    (r"^language_model\.output\.weight$", r"SKIP.lm_head"),
    (r"(layernorm|norm)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


class InternVLChatModel(PretrainedModel):
    config_class = InternVLChatConfig
    module_class = InternVLChatModule
    torch_key_map = _INTERNVL_KEY_MAP

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        """HF InternVL2 checkpoints: split InternLM2's fused wqkv into
        q/k/v before the regex renames (grouped layout: per kv group
        [g q-heads, k, v] rows)."""
        import numpy as np

        from ...core.modeling import convert_torch_state_dict

        t = config.text if config is not None else None
        g = hd = None
        if t is not None:
            g = t.num_attention_heads // t.num_key_value_heads
            hd = t.hidden_size // t.num_attention_heads
        out = {}
        for k, v in flat.items():
            m = (re.match(r"(.*\.attention)\.wqkv\.weight$", k)
                 if t is not None else None)
            if m:
                w = np.asarray(v).reshape(t.num_key_value_heads, g + 2, hd, -1)
                out[m.group(1) + ".q_proj.weight"] = \
                    w[:, :g].reshape(t.num_attention_heads * hd, -1)
                out[m.group(1) + ".k_proj.weight"] = \
                    w[:, g].reshape(t.num_key_value_heads * hd, -1)
                out[m.group(1) + ".v_proj.weight"] = \
                    w[:, g + 1].reshape(t.num_key_value_heads * hd, -1)
            else:
                out[k] = v
        out = {k.replace(".attention.q_proj", ".self_attn.q_proj")
                .replace(".attention.k_proj", ".self_attn.k_proj")
                .replace(".attention.v_proj", ".self_attn.v_proj"): v
               for k, v in out.items()}
        return convert_torch_state_dict(out, cls.torch_key_map)

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        n = config.tokens_per_tile
        ids = jnp.full((1, n + 4), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n].set(config.img_context_token_id)
        return (ids, jnp.zeros((1, v.image_size, v.image_size, 3))), {}

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)
