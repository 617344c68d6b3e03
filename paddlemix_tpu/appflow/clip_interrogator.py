"""CLIP Interrogator: image -> generation-ready prompt string.

Reference: ppdiffusers/examples/clip_interrogator/clip_interrogator/
clip_interrogator.py (Interrogator / LabelTable). A caption model (BLIP-2
here) produces the opening clause; banks of mediums / artists / movements /
trends / flavors are ranked by CLIP text-image cosine similarity and the
winners are appended.

TPU notes: bank texts are embedded once through a single jitted
fixed-chunk encoder (the last chunk is padded, so one compiled program
serves any bank size), and ranking is one matmul against the image
embedding — no per-term Python loop.
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import numpy as np

# tiny built-in banks so the tool works offline; real runs point
# ``data_path`` at the reference's data/*.txt term lists
_MEDIUMS = [
    "a photograph", "an oil painting", "a watercolor painting",
    "a 3D render", "a pencil sketch", "digital art", "a marble sculpture",
    "an anime drawing", "pixel art", "a charcoal drawing",
]
_ARTISTS = [
    "by Vincent van Gogh", "by Claude Monet", "by Greg Rutkowski",
    "by Hayao Miyazaki", "by Salvador Dali", "by Ansel Adams",
    "by Katsushika Hokusai", "by Rembrandt",
]
_MOVEMENTS = [
    "impressionism", "surrealism", "art nouveau", "minimalism",
    "baroque", "cubism", "pop art", "ukiyo-e",
]
_TRENDS = [
    "trending on artstation", "featured on pixiv", "award winning",
    "trending on cgsociety", "8k wallpaper",
]
_FLAVORS = [
    "highly detailed", "cinematic lighting", "golden hour", "bokeh",
    "dramatic atmosphere", "vibrant colors", "soft focus", "volumetric fog",
    "intricate linework", "matte painting", "studio lighting",
    "shallow depth of field", "long exposure", "symmetrical composition",
]


class LabelTable:
    """A ranked bank of prompt fragments (reference LabelTable)."""

    def __init__(self, labels: Sequence[str], encode_fn, chunk: int = 64):
        self.labels = list(labels)
        self.chunk = chunk
        embeds = []
        for i in range(0, len(self.labels), chunk):
            part = self.labels[i:i + chunk]
            pad = chunk - len(part)
            emb = encode_fn(part + [""] * pad)  # fixed shape -> one compile
            embeds.append(np.asarray(emb)[: len(part)])
        e = np.concatenate(embeds, axis=0) if embeds else np.zeros((0, 1))
        self.embeds = e / np.maximum(
            np.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

    def rank(self, image_embed: np.ndarray, top: int = 1) -> List[str]:
        if not self.labels:
            return []
        v = image_embed / np.maximum(np.linalg.norm(image_embed), 1e-8)
        scores = self.embeds @ v
        order = np.argsort(-scores)[:top]
        return [self.labels[i] for i in order]


def _load_bank(data_path: str, name: str, fallback: List[str]) -> List[str]:
    p = os.path.join(data_path, f"{name}.txt")
    if os.path.isfile(p):
        with open(p, encoding="utf-8", errors="ignore") as f:
            return [ln.strip() for ln in f if ln.strip()]
    return fallback


class Interrogator:
    """Builds prompts from an image (reference Interrogator).

    caption_fn: image -> str (e.g. a BLIP-2 bundle's answer method); pass
    None to skip captioning (bank-only prompts).
    """

    def __init__(self, clip_model, clip_processor,
                 caption_fn: Optional[Callable] = None,
                 data_path: Optional[str] = None, chunk: int = 64):
        import jax
        import jax.numpy as jnp

        self.clip = clip_model
        self.processor = clip_processor
        self.caption_fn = caption_fn

        tokenizer = getattr(clip_processor, "tokenizer", None)

        @jax.jit
        def _encode_ids(ids):
            t = self.clip.encode_text(ids)
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True)

        def encode_texts(texts):
            enc = (tokenizer(texts) if tokenizer is not None
                   else clip_processor(text=texts))
            return _encode_ids(jnp.asarray(enc["input_ids"]))

        self._encode_texts = encode_texts
        data_path = data_path or ""
        self.mediums = LabelTable(
            _load_bank(data_path, "mediums", _MEDIUMS), encode_texts, chunk)
        self.artists = LabelTable(
            _load_bank(data_path, "artists", _ARTISTS), encode_texts, chunk)
        self.movements = LabelTable(
            _load_bank(data_path, "movements", _MOVEMENTS), encode_texts, chunk)
        self.trends = LabelTable(
            _load_bank(data_path, "trends", _TRENDS), encode_texts, chunk)
        self.flavors = LabelTable(
            _load_bank(data_path, "flavors", _FLAVORS), encode_texts, chunk)

    def image_embed(self, image) -> np.ndarray:
        import jax.numpy as jnp

        enc = self.processor(images=[image])
        e = self.clip.encode_image(jnp.asarray(enc["pixel_values"]))
        e = np.asarray(e)[0]
        return e / np.maximum(np.linalg.norm(e), 1e-8)

    def caption(self, image) -> str:
        if self.caption_fn is None:
            return ""
        return str(self.caption_fn(image)).strip().rstrip(".")

    def interrogate_fast(self, image, max_flavors: int = 3) -> str:
        """caption + top flavors (reference interrogate_fast)."""
        v = self.image_embed(image)
        parts = [p for p in [self.caption(image)] if p]
        parts += self.flavors.rank(v, max_flavors)
        return ", ".join(parts)

    def interrogate_classic(self, image, max_flavors: int = 3) -> str:
        """caption, medium artist, trend, movement, flavors (reference
        interrogate_classic's prompt template)."""
        v = self.image_embed(image)
        medium = self.mediums.rank(v, 1)
        artist = self.artists.rank(v, 1)
        trend = self.trends.rank(v, 1)
        movement = self.movements.rank(v, 1)
        flavors = self.flavors.rank(v, max_flavors)
        cap = self.caption(image)
        head = f"{cap}, {medium[0]} {artist[0]}" if medium and artist else cap
        tail = ", ".join(trend + movement + flavors)
        return ", ".join(p for p in (head, tail) if p)

    interrogate = interrogate_fast
