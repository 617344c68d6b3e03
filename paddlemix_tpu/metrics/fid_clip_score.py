"""Generation-quality metrics (reference ppdiffusers/scripts/fid_clip_score/
compute_fid_clip_score.py + fid_score.py): Frechet distance between feature
distributions and CLIP image-text score.

The reference extracts features with a torch InceptionV3; offline and
TPU-native we default to the CLIP image tower (CLIP-FID, Kynkäänniemi et al.
2022 — widely used and better correlated with human raters); any callable
`images -> (N, D) features` can be plugged in."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np


def feature_stats(features: np.ndarray):
    """(N, D) features -> (mu, sigma)."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)) (fid_score.py math)."""
    import scipy.linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_fid(real_features, fake_features) -> float:
    mu1, s1 = feature_stats(real_features)
    mu2, s2 = feature_stats(fake_features)
    return frechet_distance(mu1, s1, mu2, s2)


def clip_features(clip_model, images, image_size: Optional[int] = None,
                  batch_size: int = 64) -> np.ndarray:
    """images: (N, H, W, 3) float in [0, 1] -> L2-normalized CLIP features."""
    import jax

    size = image_size or clip_model.config.vision_config.image_size
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711])
    out = []
    for i in range(0, len(images), batch_size):
        x = jnp.asarray(np.asarray(images[i:i + batch_size], np.float32))
        if x.shape[1] != size:
            x = jax.image.resize(x, (x.shape[0], size, size, 3), "bilinear")
        x = (x - mean) / std
        f = clip_model.encode_image(x.astype(clip_model.dtype)).astype(jnp.float32)
        f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
        out.append(np.asarray(f))
    return np.concatenate(out)


def clip_score(clip_model, tokenizer, images, texts, batch_size: int = 64) -> float:
    """Mean 100 * max(cos(image, text), 0) (compute_fid_clip_score.py)."""
    import jax

    img_f = clip_features(clip_model, images, batch_size=batch_size)
    scores = []
    for i in range(0, len(texts), batch_size):
        ids = jnp.asarray(tokenizer(list(texts[i:i + batch_size]))["input_ids"])
        t = clip_model.encode_text(ids).astype(jnp.float32)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        sims = jnp.sum(jnp.asarray(img_f[i:i + batch_size]) * t, axis=-1)
        scores.append(np.asarray(jnp.maximum(sims, 0.0)))
    return float(np.concatenate(scores).mean() * 100.0)


def compute_fid_clip_score(clip_model, tokenizer, real_images, fake_images,
                           texts=None):
    """One-call parity with the reference script: returns {fid, clip_score}."""
    real_f = clip_features(clip_model, real_images)
    fake_f = clip_features(clip_model, fake_images)
    out = {"fid": compute_fid(real_f, fake_f)}
    if texts is not None:
        out["clip_score"] = clip_score(clip_model, tokenizer, fake_images, texts)
    return out
