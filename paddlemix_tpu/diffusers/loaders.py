"""Checkpoint-adapter loaders for pipelines.

Rebuild of the reference loaders (ppdiffusers/ppdiffusers/loaders/:
textual_inversion.py, lora.py — LoRA itself lives in paddlemix_tpu.peft):
 - load_textual_inversion: append learned token embeddings to the text
   encoder's vocabulary + tokenizer
 - load_lora_weights: read a diffusers/kohya LoRA safetensors file into the
   peft merge-on-the-fly format and fold it into a model
"""

from __future__ import annotations

import os
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.log import logger


def load_textual_inversion(pipe, path: str, token: Optional[str] = None):
    """Extend pipe.text_encoder + pipe.tokenizer with learned embeddings.

    Accepts diffusers-format files: safetensors with a single tensor (or the
    legacy {"string_to_param": {"*": tensor}} torch layout)."""
    from safetensors import safe_open

    from ..utils.hub import resolve_file

    f = resolve_file(path, "learned_embeds.safetensors", required=False) or path
    with safe_open(f, framework="np") as sf:
        keys = list(sf.keys())
        tensor = sf.get_tensor(keys[0])
    if tensor.ndim == 1:
        tensor = tensor[None]
    n_vec, dim = tensor.shape
    token = token or os.path.splitext(os.path.basename(f))[0]
    tokens = [token] + [f"{token}_{i}" for i in range(1, n_vec)]

    tok = pipe.tokenizer
    start_id = tok.vocab_size
    for i, t in enumerate(tokens):
        tok.encoder[t] = start_id + i
        tok.decoder[start_id + i] = t
    # make the bpe pattern recognize the literal tokens
    specials = "|".join(re.escape(t) for t in tokens)
    tok.pat = re.compile(specials + "|" + tok.pat.pattern, re.IGNORECASE)
    tok.cache.update({t: t for t in tokens})
    for t in tokens:
        tok.encoder.setdefault(t + "</w>", tok.encoder[t])

    enc = pipe.text_encoder
    emb = np.asarray(enc.params["text_model"]["token_embedding"]["embedding"])
    assert emb.shape[1] == dim, f"embedding dim mismatch {emb.shape[1]} vs {dim}"
    new = np.concatenate([emb, np.asarray(tensor, emb.dtype)], axis=0)
    enc.params["text_model"]["token_embedding"]["embedding"] = jnp.asarray(new)
    enc.config.vocab_size = new.shape[0]
    logger.info("loaded textual inversion %r (%d vectors)", token, n_vec)
    return tokens


_KOHYA_RE = re.compile(r"lora_(unet|te)_(.+?)\.(lora_(down|up))\.weight$")


def load_lora_weights(path: str) -> Tuple[Dict, Dict]:
    """Read a diffusers-style LoRA safetensors file -> {target: {a, b}} maps
    for unet and text encoder (peft.merge_params format: a (in,r), b (r,out))."""
    from safetensors import safe_open

    from ..utils.hub import resolve_file

    f = resolve_file(path, "pytorch_lora_weights.safetensors", required=False) or path
    raw: Dict[str, np.ndarray] = {}
    with safe_open(f, framework="np") as sf:
        for k in sf.keys():
            raw[k] = sf.get_tensor(k)
    unet_lora: Dict[tuple, dict] = {}
    te_lora: Dict[tuple, dict] = {}
    for k, v in raw.items():
        m = re.match(r"(?:lora_)?(unet|te|text_encoder)[._](.+?)\.lora[._](down|up|A|B)\.weight$", k)
        if not m:
            continue
        scope, target, kind = m.groups()
        # torch (out,in) -> ours: a=(in,r), b=(r,out)
        arr = np.asarray(v)
        entry = ("a" if kind in ("down", "A") else "b")
        arr = arr.T
        name = target.replace("_", ".")  # kohya flattens dots
        dest = unet_lora if scope == "unet" else te_lora
        key = tuple((name + ".kernel").split("."))
        dest.setdefault(key, {})[entry] = jnp.asarray(arr)
    logger.info("loaded LoRA: %d unet targets, %d text targets",
                len(unet_lora), len(te_lora))
    return unet_lora, te_lora


def load_ip_adapter(unet, path: str, scale: float = 1.0, num_tokens: int = 4):
    """Load an IP-Adapter checkpoint into a UNet2DConditionModel
    (reference ppdiffusers/loaders/unet.py:754-828 _load_ip_adapter_weights +
    ip_adapter.py). Inserts to_k_ip/to_v_ip params into every attn2 in the
    reference's processor order (down blocks, up blocks, mid — odd key ids),
    flips the config to ip_adapter mode, and returns the image-projection
    params {kernel, bias, norm_scale, norm_bias}."""
    from safetensors import safe_open

    from ..utils.hub import resolve_file

    f = resolve_file(path, "ip-adapter.safetensors", required=False) or path
    raw: Dict[str, np.ndarray] = {}
    with safe_open(f, framework="np") as sf:
        for k in sf.keys():
            raw[k] = sf.get_tensor(k)

    cfg = unet.config
    params = unet.params

    def attn2_paths():
        heads = cfg.heads_per_block if hasattr(cfg, "heads_per_block") else None
        tf = cfg.tf_layers_per_block if hasattr(cfg, "tf_layers_per_block") else \
            [cfg.transformer_layers_per_block] * len(cfg.block_out_channels)
        if isinstance(tf, int):
            tf = [tf] * len(cfg.block_out_channels)
        for i, bt in enumerate(cfg.down_block_types):
            if bt == "CrossAttnDownBlock2D":
                for a in range(cfg.layers_per_block):
                    for t in range(tf[i]):
                        yield (f"down_blocks_{i}", f"attentions_{a}",
                               f"transformer_blocks_{t}", "attn2")
        for i, bt in enumerate(cfg.up_block_types):
            j = len(cfg.block_out_channels) - 1 - i
            if bt == "CrossAttnUpBlock2D":
                for a in range(cfg.layers_per_block + 1):
                    for t in range(tf[j]):
                        yield (f"up_blocks_{i}", f"attentions_{a}",
                               f"transformer_blocks_{t}", "attn2")
        for t in range(tf[-1]):
            yield ("mid_block", "attentions_0", f"transformer_blocks_{t}", "attn2")

    key_id = 1
    n_loaded = 0
    for path_parts in attn2_paths():
        node = params
        for part in path_parts:
            node = node[part]
        for nm in ("to_k_ip", "to_v_ip"):
            w = raw.get(f"ip_adapter.{key_id}.{nm}.weight")
            if w is None:
                raise KeyError(f"missing ip_adapter.{key_id}.{nm}.weight")
            node[nm] = {"kernel": jnp.asarray(np.asarray(w).T)}
            n_loaded += 1
        key_id += 2

    cfg.ip_adapter_tokens = num_tokens
    cfg.ip_adapter_scale = scale
    unet.module = unet.module_class(cfg, dtype=unet.dtype)
    logger.info("loaded IP-Adapter: %d ip projections", n_loaded)
    return {
        "kernel": jnp.asarray(np.asarray(raw["image_proj.proj.weight"]).T),
        "bias": jnp.asarray(raw["image_proj.proj.bias"]),
        "norm_scale": jnp.asarray(raw["image_proj.norm.weight"]),
        "norm_bias": jnp.asarray(raw["image_proj.norm.bias"]),
        "num_tokens": num_tokens,
    }


def ip_image_tokens(image_proj_params, image_embeds):
    """CLIP image embedding (B, D) -> (B, num_tokens, cross_dim) via the
    ImageProjection layer (reference models/embeddings.py ImageProjection)."""
    p = image_proj_params
    n = p["num_tokens"]
    h = image_embeds @ p["kernel"] + p["bias"]
    h = h.reshape(h.shape[0], n, -1)
    mean = h.mean(-1, keepdims=True)
    var = h.var(-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
    return h * p["norm_scale"] + p["norm_bias"]
