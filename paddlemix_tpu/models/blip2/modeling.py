"""BLIP-2: ViT + Q-Former + frozen OPT, TPU-native.

Rebuild of the reference BLIP-2 (paddlemix/models/blip2/):
 - Blip2ForConditionalGeneration.forward_stage2 captioning path
   (blip2/modeling.py:260) and stage-1 ITC loss (modeling.py:338) — the
   distributed ITC gather reuses clip_contrastive_loss (all_gather on TPU).
 - Q-Former = BERT-with-cross-attention over learned queries
   (blip2/Qformer.py, 1357 LoC) — post-LN blocks, cross-attn every
   ``cross_attention_frequency`` layers.
 - TP-sharded EVA-ViT (blip2/eva_vit.py:80,140 ColumnParallelLinear) — plain
   CLIPVisionTransformer + PartitionSpec rules here.

HF Salesforce/blip2-* torch checkpoints load via convert_foreign_state_dict."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel, convert_torch_state_dict
from ...ops import scaled_dot_product_attention
from ..clip.configuration import CLIPVisionConfig
from ..clip.modeling import CLIPVisionTransformer
from ..llama.modeling import KVCache, greedy_generate
from ..opt.modeling import OPTConfig, OPTModule


@dataclasses.dataclass
class QFormerConfig(BaseConfig):
    model_type = "blip_2_qformer"
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    cross_attention_frequency: int = 2
    encoder_hidden_size: int = 1408
    layer_norm_eps: float = 1e-12


@dataclasses.dataclass
class Blip2Config(BaseConfig):
    model_type = "blip-2"
    vision_config: Optional[Dict[str, Any]] = None
    qformer_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    num_query_tokens: int = 32
    lm_type: str = "opt"  # "opt" | "t5" (FlanT5 variant, reference stage-2)
    # "clip": HF-format tower (HF checkpoints); "eva": the EVA ViT proper
    # (post-norm/rope/SwiGLU/k-bias-less options, reference blip2/eva_vit.py
    # + clip/vit_model.py) shared with EVA-CLIP (models/clip/eva.py)
    vision_tower: str = "clip"

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.qformer_config = self.qformer_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> CLIPVisionConfig:
        if self.vision_tower == "eva":
            from ..clip.eva import EVAVisionConfig

            return EVAVisionConfig.from_dict(self.vision_config)
        return CLIPVisionConfig.from_dict(dict(self.vision_config, patch_bias=True,
                                               use_pre_layernorm=False,
                                               post_layernorm_full=True))

    @property
    def qformer(self) -> QFormerConfig:
        return QFormerConfig.from_dict(self.qformer_config)

    @property
    def text(self):
        if self.lm_type == "t5":
            from ..t5.modeling import T5Config

            return T5Config.from_dict(self.text_config)
        return OPTConfig.from_dict(self.text_config)


class _QAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, context=None):
        d = hidden.shape[-1]
        context = hidden if context is None else context
        hd = d // self.num_heads
        b, sq = hidden.shape[:2]
        sk = context.shape[1]
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(hidden).reshape(b, sq, self.num_heads, hd)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(context).reshape(b, sk, self.num_heads, hd)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(context).reshape(b, sk, self.num_heads, hd)
        out = scaled_dot_product_attention(q, k, v).reshape(b, sq, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class QFormerLayer(nn.Module):
    config: QFormerConfig
    has_cross: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_embeds):
        cfg = self.config
        # post-LN (BERT convention, reference Qformer.py)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="self_attn_norm")(
            x + _QAttention(cfg.num_attention_heads, dtype=self.dtype, name="self_attn")(x))
        if self.has_cross:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="cross_attn_norm")(
                x + _QAttention(cfg.num_attention_heads, dtype=self.dtype,
                                name="cross_attn")(x, image_embeds))
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="mlp_norm")(x + h)


class QFormer(nn.Module):
    config: QFormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query_embeds, image_embeds):
        cfg = self.config
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="layernorm")(query_embeds)
        for i in range(cfg.num_hidden_layers):
            x = QFormerLayer(cfg, has_cross=(i % cfg.cross_attention_frequency == 0),
                             dtype=self.dtype, name=f"layers_{i}")(x, image_embeds)
        return x


class Blip2Module(nn.Module):
    config: Blip2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        if cfg.vision_tower == "eva":
            from ..clip.eva import EVAVisionTransformerModule

            self.vision_model = EVAVisionTransformerModule(cfg.vision,
                                                           dtype=self.dtype)
        else:
            self.vision_model = CLIPVisionTransformer(cfg.vision, dtype=self.dtype)
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.normal(0.02),
            (1, cfg.num_query_tokens, cfg.qformer.hidden_size))
        self.qformer = QFormer(cfg.qformer, dtype=self.dtype)
        if cfg.lm_type == "t5":
            from ..t5.modeling import T5ForConditionalGenerationModule

            self.language_projection = nn.Dense(cfg.text.d_model, dtype=self.dtype)
            self.language_model = T5ForConditionalGenerationModule(
                cfg.text, dtype=self.dtype)
        else:
            self.language_projection = nn.Dense(cfg.text.hidden_size, dtype=self.dtype)
            self.language_model = OPTModule(cfg.text, dtype=self.dtype)

    def encode_image(self, pixel_values):
        """pixels -> (B, num_query_tokens, lm_hidden) query features."""
        if self.config.vision_tower == "eva":
            image_embeds = self.vision_model(pixel_values, return_all_features=True)
        else:
            image_embeds, _ = self.vision_model(pixel_values)
        queries = jnp.broadcast_to(
            self.query_tokens,
            (pixel_values.shape[0], *self.query_tokens.shape[1:])).astype(self.dtype)
        q = self.qformer(queries, image_embeds)
        return self.language_projection(q)

    def __call__(self, pixel_values, input_ids, positions=None, *, segment_ids=None,
                 cache: Optional[KVCache] = None, decoder_input_ids=None):
        """Stage-2 captioning: [query feats; text] through the frozen LLM."""
        query_feats = self.encode_image(pixel_values)
        if self.config.lm_type == "t5":
            # FlanT5: [query feats; prompt] form the ENCODER input, the T5
            # decoder generates (reference blip2/modeling.py forward_stage2
            # T5 branch)
            text_embeds = self.language_model.shared(input_ids)
            enc_in = jnp.concatenate([query_feats.astype(text_embeds.dtype),
                                      text_embeds], axis=1)
            enc = self.language_model.encode(None, inputs_embeds=enc_in)
            if decoder_input_ids is None:
                decoder_input_ids = jnp.zeros((input_ids.shape[0], 1), jnp.int32)
            return self.language_model.decode(decoder_input_ids, enc, cache=cache)
        text_embeds = self.language_model.embed(input_ids)
        inputs_embeds = jnp.concatenate([query_feats.astype(text_embeds.dtype),
                                         text_embeds], axis=1)
        b, s = inputs_embeds.shape[:2]
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(s), (b, s))
        return self.language_model(positions=positions, inputs_embeds=inputs_embeds,
                                   segment_ids=segment_ids, cache=cache)


class Blip2ForConditionalGeneration(PretrainedModel):
    config_class = Blip2Config
    module_class = Blip2Module

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        return (jnp.zeros((1, v.image_size, v.image_size, 3)),
                jnp.zeros((1, 4), jnp.int32)), {}

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        import numpy as np

        # HF Blip2 vision attention is fused qkv + "projection": split to ours
        flat = dict(flat)
        for k in list(flat.keys()):
            m = re.match(r"^(vision_model\.encoder\.layers\.\d+\.self_attn\.)qkv\.(weight|bias)$", k)
            if m:
                arr = np.asarray(flat.pop(k))
                parts = np.split(arr, 3, axis=0)
                for name, part in zip(("q_proj", "k_proj", "v_proj"), parts):
                    flat[m.group(1) + name + "." + m.group(2)] = part
            if ".self_attn.projection." in k and k.startswith("vision_model"):
                flat[k.replace(".projection.", ".out_proj.")] = flat.pop(k)
        out = {}
        for k, v in flat.items():
            nk = k
            nk = re.sub(r"^vision_model\.", "vision_model.", nk)
            # HF vision tower names (Blip2 vision == CLIP-ish)
            nk = re.sub(r"vision_model\.embeddings\.patch_embedding\.", "vision_model.patch_embed.proj.", nk)
            nk = re.sub(r"vision_model\.embeddings\.class_embedding$", "vision_model.class_embedding", nk)
            nk = re.sub(r"vision_model\.embeddings\.position_embedding$", "vision_model.position_embedding", nk)
            nk = re.sub(r"vision_model\.encoder\.layers\.(\d+)\.", r"vision_model.layers_\1.", nk)
            nk = re.sub(r"\.self_attn\.", ".attn.", nk) if nk.startswith("vision_model") else nk
            nk = re.sub(r"\.layer_norm1\.", ".norm1.", nk)
            nk = re.sub(r"\.layer_norm2\.", ".norm2.", nk)
            nk = re.sub(r"vision_model\.post_layernorm\.", "vision_model.post_layernorm.", nk)
            # qformer BERT names
            nk = re.sub(r"^qformer\.encoder\.layer\.(\d+)\.", r"qformer.layers_\1.", nk)
            nk = re.sub(r"\.attention\.attention\.query\.", ".self_attn.q_proj.", nk)
            nk = re.sub(r"\.attention\.attention\.key\.", ".self_attn.k_proj.", nk)
            nk = re.sub(r"\.attention\.attention\.value\.", ".self_attn.v_proj.", nk)
            nk = re.sub(r"\.attention\.output\.dense\.", ".self_attn.out_proj.", nk)
            nk = re.sub(r"\.attention\.output\.LayerNorm\.", ".self_attn_norm.", nk)
            nk = re.sub(r"\.crossattention\.attention\.query\.", ".cross_attn.q_proj.", nk)
            nk = re.sub(r"\.crossattention\.attention\.key\.", ".cross_attn.k_proj.", nk)
            nk = re.sub(r"\.crossattention\.attention\.value\.", ".cross_attn.v_proj.", nk)
            nk = re.sub(r"\.crossattention\.output\.dense\.", ".cross_attn.out_proj.", nk)
            nk = re.sub(r"\.crossattention\.output\.LayerNorm\.", ".cross_attn_norm.", nk)
            nk = re.sub(r"\.intermediate_query\.dense\.", ".fc1.", nk)
            nk = re.sub(r"\.output_query\.dense\.", ".fc2.", nk)
            nk = re.sub(r"\.output_query\.LayerNorm\.", ".mlp_norm.", nk)
            nk = re.sub(r"^qformer\.layernorm\.", "qformer.layernorm.", nk)
            # OPT language model
            nk = re.sub(r"^language_model\.model\.decoder\.", "language_model.", nk)
            nk = re.sub(r"^language_model\.lm_head\.", "SKIP.", nk)
            nk = re.sub(r"language_model\.embed_tokens\.weight$",
                        "language_model.embed_tokens.embedding", nk)
            nk = re.sub(r"language_model\.embed_positions\.weight$",
                        "language_model.embed_positions.embedding", nk)
            nk = re.sub(r"\.layers\.(\d+)\.", r".layers_\1.", nk)
            nk = re.sub(r"^query_tokens$", "query_tokens", nk)
            if nk.startswith("SKIP."):
                continue
            out[nk] = v
        return convert_torch_state_dict(
            out, ((r"(LayerNorm|layer_norm|layernorm|_norm|norm\d?)\.weight$", r"\1.scale"),
                  (r"\.weight$", r".kernel")))

    def encode_image(self, pixel_values):
        return self.module.apply({"params": self.params}, pixel_values,
                                 method=self.module.encode_image)

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)

    def generate(self, pixel_values, input_ids, attention_mask=None,
                 max_new_tokens: int = 32, **kwargs):
        feats = self.encode_image(pixel_values)
        b = input_ids.shape[0]
        text_embeds = self.module.apply({"params": self.params},
                                        jnp.asarray(input_ids),
                                        method=lambda m, ids: m.language_model.embed(ids))
        inputs_embeds = jnp.concatenate([feats.astype(text_embeds.dtype), text_embeds], axis=1)
        nq = feats.shape[1]
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        full_mask = jnp.concatenate([jnp.ones((b, nq), jnp.int32), jnp.asarray(attention_mask)],
                                    axis=1)
        full_ids = jnp.concatenate([jnp.zeros((b, nq), jnp.int32), jnp.asarray(input_ids)], axis=1)
        lm = _OPTView(self)
        return greedy_generate(lm, full_ids, full_mask, max_new_tokens=max_new_tokens,
                               inputs_embeds=inputs_embeds, **kwargs)


class _OPTView:
    def __init__(self, blip2: Blip2ForConditionalGeneration):
        self.config = blip2.config.text
        self.params = blip2.params["language_model"]
        self.module = OPTModule(self.config, dtype=blip2.dtype)
        self.dtype = blip2.dtype

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config, batch, max_len, dtype=dtype or self.dtype)
