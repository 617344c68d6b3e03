"""Image conversion/resize primitives shared by all processors.

Rebuild of the reference's processor toolbox (paddlemix/processors/
image_processing_utils.py, image_transform_utils.py) with a TPU twist: every
transform has a host (numpy/PIL) path for the data loader AND a jittable
jax path so preprocessing can run on-device and be overlap-hidden
(BASELINE.json: preprocessing <5% of step time).

All tensors are NHWC float32 unless noted."""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple, Union

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

ImageInput = Union["Image.Image", np.ndarray]

OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def to_numpy_rgb(image: ImageInput) -> np.ndarray:
    """-> (H, W, 3) uint8/float numpy."""
    if Image is not None and isinstance(image, Image.Image):
        return np.asarray(image.convert("RGB"))
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[0] in (1, 3) and arr.ndim == 3 and arr.shape[0] < arr.shape[-1]:
        arr = np.transpose(arr, (1, 2, 0))  # CHW -> HWC
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr[..., :3]


def resize(image: np.ndarray, size: Tuple[int, int], resample: str = "bicubic") -> np.ndarray:
    """size: (height, width). PIL for fidelity with the reference pipelines."""
    h, w = size
    if Image is not None:
        pil = Image.fromarray(image.astype(np.uint8)) if image.dtype != np.uint8 else Image.fromarray(image)
        filt = {"bicubic": Image.BICUBIC, "bilinear": Image.BILINEAR, "nearest": Image.NEAREST,
                "lanczos": Image.LANCZOS}[resample]
        return np.asarray(pil.resize((w, h), filt))
    import jax

    return np.asarray(jax.image.resize(image.astype(np.float32), (h, w, image.shape[-1]),
                                       method="bicubic" if resample == "bicubic" else "bilinear"))


def resize_shortest_edge(image: np.ndarray, shortest: int, resample: str = "bicubic") -> np.ndarray:
    """Reference semantics (transformers/paddle get_resize_output_image_size):
    the long side is int-TRUNCATED, not rounded — a one-pixel difference here
    shifts every pixel after the center crop (caught by
    tests/test_processor_fidelity.py against the HF processors)."""
    h, w = image.shape[:2]
    short, long = (h, w) if h <= w else (w, h)
    new_long = int(shortest * long / short)
    nh, nw = (shortest, new_long) if h <= w else (new_long, shortest)
    return resize(image, (nh, nw), resample)


def center_crop(image: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    ch, cw = size
    h, w = image.shape[:2]
    top = max((h - ch) // 2, 0)
    left = max((w - cw) // 2, 0)
    out = image[top: top + ch, left: left + cw]
    if out.shape[0] != ch or out.shape[1] != cw:  # pad if image smaller than crop
        padded = np.zeros((ch, cw, image.shape[-1]), dtype=image.dtype)
        padded[: out.shape[0], : out.shape[1]] = out
        out = padded
    return out


def normalize(image: np.ndarray, mean: Sequence[float], std: Sequence[float]) -> np.ndarray:
    return (image - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def jax_resize_normalize(pixels, size: Tuple[int, int], mean, std, rescale: float = 1 / 255.0):
    """Jittable on-device preprocess: (B,H,W,3) uint8/float -> resized+normalized."""
    import jax
    import jax.numpy as jnp

    b = pixels.shape[0]
    x = pixels.astype(jnp.float32) * rescale
    x = jax.image.resize(x, (b, size[0], size[1], 3), method="bilinear")
    return (x - jnp.asarray(mean)) / jnp.asarray(std)
