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
