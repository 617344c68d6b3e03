"""Qwen2-VL: native dynamic-resolution ViT + M-RoPE Qwen2 LLM, TPU-native.

Rebuild of the reference Qwen2-VL (paddlemix/models/qwen2_vl/):
 - varlen flash attention over cu_seqlens + unpad/pad round trips
   (modeling_qwen2_vl.py:710-812, bert_padding.py) -> segment-id flash
   attention over a packed, statically-padded patch sequence (no unpadding;
   shapes stay static for XLA).
 - M-RoPE (apply_multimodal_rotary_pos_emb :179, get_rope_index :1217) ->
   host-side numpy get_rope_index + ops.rope.mrope_cos_sin feeding the
   decoder's rope_override.
 - Qwen2VisionTransformerPretrainedModel (:916) with 2D rotary + PatchMerger.
 - LLM = models.llama with attention_bias=True (Qwen2).

HF Qwen/Qwen2-VL-* torch checkpoints load via convert_foreign_state_dict."""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel, convert_torch_state_dict
from ...ops import apply_rope, mrope_cos_sin, rope_cos_sin, scaled_dot_product_attention
from ...ops.attention import SegmentIds
from ..llama.configuration import LlamaConfig
from ..llama.modeling import KVCache, LlamaModule, sample_token, SamplingConfig


@dataclasses.dataclass
class Qwen2VLVisionConfig(BaseConfig):
    model_type = "qwen2_vl_vision"
    depth: int = 32
    embed_dim: int = 1280
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge_size: int = 2
    temporal_patch_size: int = 2
    mlp_ratio: float = 4.0
    hidden_size: int = 3584  # output (LLM) dim


@dataclasses.dataclass
class Qwen2VLConfig(BaseConfig):
    model_type = "qwen2_vl"
    vision_config: Optional[Dict[str, Any]] = None
    text_config: Optional[Dict[str, Any]] = None
    image_token_id: int = 151655
    video_token_id: int = 151656
    vision_start_token_id: int = 151652
    rope_theta: float = 1000000.0
    mrope_section: Tuple[int, ...] = (16, 24, 24)

    def __post_init__(self):
        self.vision_config = self.vision_config or {}
        self.text_config = self.text_config or {}

    @property
    def vision(self) -> Qwen2VLVisionConfig:
        return Qwen2VLVisionConfig.from_dict(self.vision_config)

    @property
    def text(self) -> LlamaConfig:
        return LlamaConfig.from_dict(dict(self.text_config, attention_bias=True,
                                          rope_theta=self.rope_theta))


class VisionBlock(nn.Module):
    embed_dim: int
    num_heads: int
    mlp_ratio: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cos, sin, segment_ids):
        d = self.embed_dim
        hd = d // self.num_heads
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        b, s = h.shape[:2]
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * self.num_heads, hd), 3, axis=2)
        q, k = apply_rope(q, k, cos, sin)
        attn = scaled_dot_product_attention(q, k, v, segment_ids=segment_ids)
        attn = nn.Dense(d, dtype=self.dtype, name="proj")(attn.reshape(b, s, d))
        x = x + attn
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False) * 1.0  # quick_gelu in HF qwen2vl
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class Qwen2VisionTransformer(nn.Module):
    """Packed-patch vision tower. Inputs are host-prepared:
    patches (1, P, C*tp*ps*ps), hw positions (1, P, 2), segment ids (1, P)."""

    config: Qwen2VLVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, patches, pos_hw, segment_ids):
        cfg = self.config
        x = nn.Dense(cfg.embed_dim, use_bias=False, dtype=self.dtype,
                     name="patch_embed")(patches)
        # 2D rotary: half the head dim rotates with h, half with w
        hd = cfg.embed_dim // cfg.num_heads
        half = hd // 2
        cos_h, sin_h = rope_cos_sin(pos_hw[..., 0], half)
        cos_w, sin_w = rope_cos_sin(pos_hw[..., 1], half)
        # interleave halves: [h_half ; w_half] duplicated (rotate_half layout)
        cos = jnp.concatenate([cos_h[..., :half // 2], cos_w[..., :half // 2],
                               cos_h[..., :half // 2], cos_w[..., :half // 2]], axis=-1)
        sin = jnp.concatenate([sin_h[..., :half // 2], sin_w[..., :half // 2],
                               sin_h[..., :half // 2], sin_w[..., :half // 2]], axis=-1)
        seg = SegmentIds(segment_ids, segment_ids)
        for i in range(cfg.depth):
            x = VisionBlock(cfg.embed_dim, cfg.num_heads, cfg.mlp_ratio,
                            dtype=self.dtype, name=f"blocks_{i}")(x, cos, sin, seg)
        # PatchMerger: 2x2 groups are consecutive (processor ordering)
        m = cfg.spatial_merge_size ** 2
        b, p, d = x.shape
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="merger_ln")(x)
        x = x.reshape(b, p // m, m * d)
        x = nn.Dense(m * d, dtype=self.dtype, name="merger_fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="merger_fc2")(x)


class Qwen2VLModule(nn.Module):
    config: Qwen2VLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = Qwen2VisionTransformer(self.config.vision, dtype=self.dtype)
        self.language_model = LlamaModule(self.config.text, dtype=self.dtype)

    def encode_images(self, patches, pos_hw, segment_ids):
        return self.visual(patches, pos_hw, segment_ids)

    def splice(self, input_ids, image_features):
        """image_features: (1, M, D) packed merged features (pads included);
        j-th image-token position takes feature row j."""
        token_embeds = self.language_model.embed(input_ids)
        is_img = (input_ids == self.config.image_token_id) | \
                 (input_ids == self.config.video_token_id)
        feat_idx = jnp.clip(jnp.cumsum(is_img.astype(jnp.int32), axis=-1) - 1, 0,
                            image_features.shape[1] - 1)
        gathered = jnp.take_along_axis(
            jnp.broadcast_to(image_features,
                             (input_ids.shape[0], *image_features.shape[1:])),
            feat_idx[:, :, None], axis=1)
        return jnp.where(is_img[:, :, None], gathered.astype(token_embeds.dtype), token_embeds)

    def __call__(self, input_ids, position_ids=None, pixel_patches=None,
                 patch_pos_hw=None, patch_segments=None, *, segment_ids=None,
                 cache: Optional[KVCache] = None, positions=None):
        """position_ids: (3, B, S) M-RoPE streams (host get_rope_index)."""
        cfg = self.config
        if pixel_patches is not None:
            feats = self.encode_images(pixel_patches, patch_pos_hw, patch_segments)
            inputs_embeds = self.splice(input_ids, feats)
        else:
            inputs_embeds = None
        rope_override = None
        if position_ids is not None:
            hd = cfg.text.head_dim_
            cos, sin = mrope_cos_sin(position_ids, hd, cfg.mrope_section, cfg.rope_theta)
            rope_override = (cos, sin)
        return self.language_model(input_ids, positions, inputs_embeds=inputs_embeds,
                                   segment_ids=segment_ids, cache=cache,
                                   rope_override=rope_override)


def get_rope_index(input_ids: np.ndarray, grid_thw: Optional[np.ndarray],
                   image_token_id: int, video_token_id: int,
                   spatial_merge_size: int = 2,
                   attention_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Host port of the reference get_rope_index (modeling_qwen2_vl.py:1217):
    returns (3, B, S) t/h/w position streams."""
    ids = np.asarray(input_ids)
    b, s = ids.shape
    out = np.zeros((3, b, s), dtype=np.int64)
    for bi in range(b):
        row = ids[bi]
        mask = np.ones(s, bool) if attention_mask is None else attention_mask[bi].astype(bool)
        pos = 0  # next position value
        img_i = 0
        t_stream, h_stream, w_stream = out[0, bi], out[1, bi], out[2, bi]
        j = 0
        while j < s:
            if not mask[j]:
                t_stream[j] = h_stream[j] = w_stream[j] = 1
                j += 1
                continue
            if row[j] in (image_token_id, video_token_id) and grid_thw is not None:
                t, h, w = grid_thw[img_i]
                hh, ww = h // spatial_merge_size, w // spatial_merge_size
                n = int(t * hh * ww)
                tt = np.repeat(np.arange(t), hh * ww) + pos
                hh_idx = np.tile(np.repeat(np.arange(hh), ww), t) + pos
                ww_idx = np.tile(np.arange(ww), t * hh) + pos
                t_stream[j: j + n] = tt
                h_stream[j: j + n] = hh_idx
                w_stream[j: j + n] = ww_idx
                pos = int(max(tt.max(), hh_idx.max(), ww_idx.max())) + 1
                img_i += 1
                j += n
            else:
                t_stream[j] = h_stream[j] = w_stream[j] = pos
                pos += 1
                j += 1
    return out


class Qwen2VLForConditionalGeneration(PretrainedModel):
    config_class = Qwen2VLConfig
    module_class = Qwen2VLModule

    @classmethod
    def example_inputs(cls, config):
        v = config.vision
        m = v.spatial_merge_size ** 2
        n_patches = 2 * m  # two merged positions
        patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2
        s = n_patches // m + 4
        ids = jnp.full((1, s), 5, jnp.int32)
        ids = ids.at[:, 1: 1 + n_patches // m].set(config.image_token_id)
        return (ids,), {
            "position_ids": jnp.zeros((3, 1, s), jnp.int32),
            "pixel_patches": jnp.zeros((1, n_patches, patch_dim)),
            "patch_pos_hw": jnp.zeros((1, n_patches, 2), jnp.int32),
            "patch_segments": jnp.ones((1, n_patches), jnp.int32),
        }

    @classmethod
    def convert_foreign_state_dict(cls, flat, config):
        out = {}
        for k, v in flat.items():
            nk = k
            nk = re.sub(r"^model\.", "language_model.", nk)
            nk = re.sub(r"^lm_head\.", "language_model.lm_head.", nk)
            nk = re.sub(r"^language_model\.language_model\.", "language_model.", nk)
            nk = re.sub(r"language_model\.embed_tokens\.weight$",
                        "language_model.embed_tokens.embedding", nk)
            nk = re.sub(r"\.layers\.(\d+)\.", r".layers_\1.", nk)
            # vision tower
            nk = re.sub(r"^visual\.patch_embed\.proj\.weight$", "visual.patch_embed.weight", nk)
            nk = re.sub(r"^visual\.blocks\.(\d+)\.", r"visual.blocks_\1.", nk)
            nk = re.sub(r"\.attn\.qkv\.", ".qkv.", nk)
            nk = re.sub(r"\.attn\.proj\.", ".proj.", nk)
            nk = re.sub(r"\.mlp\.fc1\.", ".fc1.", nk)
            nk = re.sub(r"\.mlp\.fc2\.", ".fc2.", nk)
            nk = re.sub(r"^visual\.merger\.ln_q\.", "visual.merger_ln.", nk)
            nk = re.sub(r"^visual\.merger\.mlp\.0\.", "visual.merger_fc1.", nk)
            nk = re.sub(r"^visual\.merger\.mlp\.2\.", "visual.merger_fc2.", nk)
            out[nk] = v
        # the conv3d patch embed (D, C, T, ps, ps) flattens to a dense kernel
        key = "visual.patch_embed.weight"
        if key in out and getattr(out[key], "ndim", 0) == 5:
            w = np.asarray(out.pop(key))
            out["visual.patch_embed.kernel"] = w.reshape(w.shape[0], -1).T
        return convert_torch_state_dict(
            out, ((r"(layernorm|_ln|ln_q|norm\d?|norm)\.weight$", r"\1.scale"),
                  (r"\.weight$", r".kernel")))

    def init_cache(self, batch, max_len, dtype=None):
        return KVCache.create(self.config.text, batch, max_len, dtype=dtype or self.dtype)

    def generate(self, input_ids, position_ids=None, pixel_patches=None,
                 patch_pos_hw=None, patch_segments=None, attention_mask=None,
                 max_new_tokens: int = 32, sampling: SamplingConfig = SamplingConfig(),
                 seed: int = 0):
        """Prefill with M-RoPE + spliced vision, decode with continued
        positions (t=h=w during decode -> plain rope equals M-RoPE)."""
        cfg = self.config
        module = self.module
        params = self.params
        input_ids = jnp.asarray(input_ids)
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(s), (3, b, s))
        max_len = s + max_new_tokens
        eos = cfg.text.eos_token_id

        @jax.jit
        def run(params, input_ids, position_ids, attention_mask, key,
                pixel_patches, patch_pos_hw, patch_segments):
            cache = KVCache.create(cfg.text, b, max_len, jnp.float32 if self.dtype == jnp.float32 else self.dtype)
            positions = jnp.cumsum(attention_mask, axis=-1) - 1
            positions = jnp.where(attention_mask > 0, positions, -1)
            seg = SegmentIds(attention_mask, attention_mask)
            logits, cache = module.apply(
                {"params": params}, input_ids, position_ids,
                pixel_patches, patch_pos_hw, patch_segments,
                segment_ids=seg, cache=cache, positions=positions)
            lengths = attention_mask.sum(axis=-1).astype(jnp.int32)
            last = logits[jnp.arange(b), lengths - 1]
            key, sub = jax.random.split(key)
            next_tok = sample_token(last.astype(jnp.float32), sub, sampling)
            rope_pos = position_ids[0].max(axis=-1) + 1  # (B,) next M-RoPE position

            tokens = jnp.zeros((b, max_new_tokens), jnp.int32).at[:, 0].set(next_tok)
            done = next_tok == eos

            def cond(c):
                step, _, _, done, _, _ = c
                return (step < max_new_tokens - 1) & ~jnp.all(done)

            def body(c):
                step, tokens, cache, done, key, rope_pos = c
                cur = tokens[:, step][:, None]
                pos3 = jnp.broadcast_to(rope_pos[None, :, None], (3, b, 1))
                logits, cache = module.apply(
                    {"params": params}, cur, pos3, None, None, None,
                    cache=cache, positions=cache.lengths[:, None])
                key, sub = jax.random.split(key)
                nxt = sample_token(logits[:, -1].astype(jnp.float32), sub, sampling)
                nxt = jnp.where(done, eos, nxt)
                tokens = tokens.at[:, step + 1].set(nxt)
                return step + 1, tokens, cache, done | (nxt == eos), key, rope_pos + 1

            _, tokens, _, _, _, _ = jax.lax.while_loop(
                cond, body, (0, tokens, cache, done, key, rope_pos + 1))
            return tokens

        return run(params, input_ids, jnp.asarray(position_ids),
                   jnp.asarray(attention_mask), jax.random.PRNGKey(seed),
                   pixel_patches, patch_pos_hw, patch_segments)
