"""InternVL2 dynamic tiling (host side).

Rebuild of the reference dynamic_preprocess / find_closest_aspect_ratio
(paddlemix/processors/internvl_processing.py:651, :635): split an arbitrary
image into up to max_num 448px tiles matching the closest aspect ratio, plus
an optional thumbnail. Output is a fixed-size stack (padded + tile mask) so
the ViT batch is static-shape on TPU."""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from .base import BaseImageProcessor
from .image_utils import IMAGENET_MEAN, IMAGENET_STD, normalize, resize, to_numpy_rgb


def find_closest_aspect_ratio(aspect_ratio: float, target_ratios: Sequence[Tuple[int, int]],
                              width: int, height: int, image_size: int) -> Tuple[int, int]:
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target_ar = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target_ar)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def dynamic_preprocess(image: np.ndarray, min_num: int = 1, max_num: int = 12,
                       image_size: int = 448, use_thumbnail: bool = True) -> List[np.ndarray]:
    h, w = image.shape[:2]
    aspect_ratio = w / h
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    ratio = find_closest_aspect_ratio(aspect_ratio, target_ratios, w, h, image_size)
    tw, th = image_size * ratio[0], image_size * ratio[1]
    resized = resize(image.astype(np.uint8), (th, tw))
    cols = tw // image_size
    tiles = []
    for i in range(ratio[0] * ratio[1]):
        x0 = (i % cols) * image_size
        y0 = (i // cols) * image_size
        tiles.append(resized[y0: y0 + image_size, x0: x0 + image_size])
    if use_thumbnail and len(tiles) > 1:
        tiles.append(resize(image.astype(np.uint8), (image_size, image_size)))
    return tiles


def dynamic_preprocess2(image: np.ndarray, min_num: int = 1, max_num: int = 6,
                        image_size: int = 448, use_thumbnail: bool = False,
                        prior_aspect_ratio: Tuple[int, int] = (1, 1)
                        ) -> List[np.ndarray]:
    """MiniMonkey complementary second-scale tiling (reference
    paddlemix/datasets/internvl_dataset.py:644 dynamic_preprocess2): pick a
    grid whose rows AND cols do NOT divide the first pass's grid, so the two
    passes' tile boundaries interleave instead of coinciding."""
    h, w = image.shape[:2]
    aspect_ratio = w / h
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    complementary = [r for r in target_ratios
                     if prior_aspect_ratio[0] % r[0] != 0
                     and prior_aspect_ratio[1] % r[1] != 0] or target_ratios
    ratio = find_closest_aspect_ratio(aspect_ratio, complementary, w, h,
                                      image_size)
    tw, th = image_size * ratio[0], image_size * ratio[1]
    resized = resize(image.astype(np.uint8), (th, tw))
    cols = tw // image_size
    tiles = []
    for i in range(ratio[0] * ratio[1]):
        x0 = (i % cols) * image_size
        y0 = (i // cols) * image_size
        tiles.append(resized[y0: y0 + image_size, x0: x0 + image_size])
    if use_thumbnail and len(tiles) > 1:
        tiles.append(resize(image.astype(np.uint8), (image_size, image_size)))
    return tiles


def minimonkey_preprocess(image: np.ndarray, image_size: int = 448,
                          min_num: int = 3, max_num: int = 7,
                          min_num2: int = 2, max_num2: int = 3
                          ) -> List[np.ndarray]:
    """MiniMonkey two-pass multi-scale tiling (reference
    examples/minimonkey/chat_demo_minimonkey.py:41-50): a detail pass at the
    closest grid + a complementary coarse pass + one thumbnail."""
    h, w = image.shape[:2]
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda x: x[0] * x[1])
    ratio1 = find_closest_aspect_ratio(w / h, target_ratios, w, h, image_size)
    tiles = dynamic_preprocess(image, min_num, max_num, image_size,
                               use_thumbnail=True)
    tiles2 = dynamic_preprocess2(image, min_num2, max_num2, image_size,
                                 use_thumbnail=False,
                                 prior_aspect_ratio=ratio1)
    # thumbnail (from pass 1) goes last, reference token order
    return tiles[:-1] + tiles2 + tiles[-1:] if len(tiles) > 1 \
        else tiles + tiles2


@dataclasses.dataclass
class InternVLImageProcessor(BaseImageProcessor):
    model_type = "internvl_image_processor"
    image_size: int = 448
    min_num: int = 1
    max_num: int = 12
    use_thumbnail: bool = True
    pad_to_tiles: int = 13  # static bucket (max_num + thumbnail)
    multi_scale: bool = False  # MiniMonkey two-pass complementary tiling
    image_mean: Tuple[float, ...] = IMAGENET_MEAN
    image_std: Tuple[float, ...] = IMAGENET_STD

    def __call__(self, images) -> dict:
        if not isinstance(images, (list, tuple)):
            images = [images]
        all_tiles, masks, counts = [], [], []
        for im in images:
            arr = to_numpy_rgb(im)
            if self.multi_scale:
                tiles = minimonkey_preprocess(arr, self.image_size,
                                              max_num=self.max_num)
            else:
                tiles = dynamic_preprocess(arr, self.min_num, self.max_num,
                                           self.image_size, self.use_thumbnail)
            n = len(tiles)
            tiles = [normalize(t.astype(np.float32) / 255.0, self.image_mean, self.image_std)
                     for t in tiles]
            while len(tiles) < self.pad_to_tiles:
                tiles.append(np.zeros_like(tiles[0]))
            all_tiles.append(np.stack(tiles[: self.pad_to_tiles]))
            masks.append([1] * min(n, self.pad_to_tiles) +
                         [0] * max(self.pad_to_tiles - n, 0))
            counts.append(n)
        return {
            "pixel_values": np.stack(all_tiles),          # (B, T, H, W, 3)
            "tile_mask": np.asarray(masks, np.int32),     # (B, T)
            "num_tiles": np.asarray(counts, np.int32),
        }


def pixel_unshuffle(x: np.ndarray, scale_factor: float = 0.5) -> np.ndarray:
    """InternVL pixel-unshuffle on (B, H, W, C) features (reference
    modeling_internvl_chat.py pixel_shuffle)."""
    b, h, w, c = x.shape
    r = int(1 / scale_factor)
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // r, w // r, c * r * r)
