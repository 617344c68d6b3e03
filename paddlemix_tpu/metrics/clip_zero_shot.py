"""CLIP zero-shot classification eval.

Rebuild of the reference's ClipZeroShot metric
(paddlemix/metrics/clip_zero_shot.py:24-120): build a classifier from prompt
templates, score image features, report top-1/top-5."""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a bad photo of a {}.",
    "a photo of many {}.",
)


def build_zero_shot_classifier(
    encode_text: Callable[[np.ndarray], jnp.ndarray],
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[str] = DEFAULT_TEMPLATES,
    batch_size: int = 64,
) -> jnp.ndarray:
    """-> (num_classes, dim) L2-normalized class embeddings (template-averaged)."""
    embeddings = []
    for i in range(0, len(classnames), batch_size):
        chunk = classnames[i: i + batch_size]
        per_class = []
        for template in templates:
            ids = tokenizer([template.format(c) for c in chunk])["input_ids"]
            feats = encode_text(jnp.asarray(ids))
            per_class.append(feats / jnp.linalg.norm(feats, axis=-1, keepdims=True))
        avg = jnp.mean(jnp.stack(per_class), axis=0)
        embeddings.append(avg / jnp.linalg.norm(avg, axis=-1, keepdims=True))
    return jnp.concatenate(embeddings, axis=0)


def zero_shot_accuracy(image_feats: jnp.ndarray, classifier: jnp.ndarray,
                       labels: jnp.ndarray, topk: Sequence[int] = (1, 5)) -> dict:
    image_feats = image_feats / jnp.linalg.norm(image_feats, axis=-1, keepdims=True)
    logits = image_feats @ classifier.T
    ranks = jnp.argsort(-logits, axis=-1)
    out = {}
    for k in topk:
        k_eff = min(k, logits.shape[-1])
        hit = jnp.any(ranks[:, :k_eff] == labels[:, None], axis=-1)
        out[f"top{k}"] = float(jnp.mean(hit))
    return out
