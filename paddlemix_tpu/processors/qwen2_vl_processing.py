"""Qwen2-VL dynamic-resolution processing (host side).

Rebuild of the reference processor (paddlemix/processors/qwen2_vl_processing.py):
 - smart_resize to multiples of patch*merge=28 within min/max pixels (:641,
   factors/limits :612-618)
 - patch extraction in merge-grouped order (2x2 blocks consecutive), matching
   the vision tower's PatchMerger expectation
 - per-patch (h, w) rotary positions and per-image segment ids for the packed
   static-shape attention (replaces cu_seqlens varlen)
 - prompt expansion: one <|image_pad|> placeholder per merged patch."""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .base import BaseImageProcessor
from .image_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD, normalize, resize, to_numpy_rgb


def smart_resize(height: int, width: int, factor: int = 28,
                 min_pixels: int = 56 * 56, max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """Reference qwen2_vl_processing.py:641 smart_resize."""
    if height < factor or width < factor:
        scale = factor / min(height, width)
        height, width = math.ceil(height * scale), math.ceil(width * scale)
    if max(height, width) / min(height, width) > 200:
        raise ValueError("absolute aspect ratio must be smaller than 200")
    h_bar = round(height / factor) * factor
    w_bar = round(width / factor) * factor
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = math.floor(height / beta / factor) * factor
        w_bar = math.floor(width / beta / factor) * factor
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = math.ceil(height * beta / factor) * factor
        w_bar = math.ceil(width * beta / factor) * factor
    return h_bar, w_bar


def vision_patch_positions(grid_thw: Sequence[Tuple[int, int, int]],
                           merge_size: int = 2) -> np.ndarray:
    """(h, w) rotary position per patch in merge-grouped order
    (matches the HF/reference rot_pos_emb permutation)."""
    out = []
    for t, h, w in grid_thw:
        hpos = np.arange(h)[:, None].repeat(w, axis=1)
        wpos = np.arange(w)[None, :].repeat(h, axis=0)

        def perm(a):
            return a.reshape(h // merge_size, merge_size, w // merge_size,
                             merge_size).transpose(0, 2, 1, 3).reshape(-1)

        hw = np.stack([perm(hpos), perm(wpos)], axis=-1)
        out.append(np.tile(hw, (t, 1)))
    return np.concatenate(out, axis=0)


def extract_patches(image: np.ndarray, patch_size: int = 14, merge_size: int = 2,
                    temporal_patch_size: int = 2) -> Tuple[np.ndarray, Tuple[int, int, int]]:
    """(H, W, 3) image or (T, H, W, 3) video -> (n_patches, 3*tp*ps*ps) in
    merge-grouped order.

    Single images are duplicated along the temporal axis; videos are padded to
    a multiple of temporal_patch_size by repeating the last frame (reference
    qwen2_vl_processing fetch_video behavior)."""
    tp = temporal_patch_size
    if image.ndim == 3:
        frames = np.stack([image] * tp)  # (tp, H, W, C)
    else:
        frames = image
        if frames.shape[0] % tp:
            pad = tp - frames.shape[0] % tp
            frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    t_groups = frames.shape[0] // tp
    h, w = frames.shape[1:3]
    gh, gw = h // patch_size, w // patch_size
    c = frames.shape[-1]
    m = merge_size
    out = []
    for g in range(t_groups):
        x = frames[g * tp: (g + 1) * tp].reshape(tp, gh, patch_size, gw, patch_size, c)
        # merge-grouped order: (gh/m, gw/m, m, m) patch blocks consecutive
        x = x.transpose(1, 3, 0, 2, 4, 5)  # (gh, gw, tp, ps, ps, C)
        x = x.reshape(gh // m, m, gw // m, m, tp, patch_size, patch_size, c)
        x = x.transpose(0, 2, 1, 3, 4, 7, 5, 6)  # (gh/m, gw/m, m, m, tp, C, ps, ps)
        out.append(x.reshape(gh * gw, c * tp * patch_size * patch_size))
    return np.concatenate(out).astype(np.float32), (t_groups, gh, gw)


def smart_nframes(total_frames: int, fps: float = 2.0, video_fps: float = 30.0,
                  min_frames: int = 4, max_frames: int = 768,
                  temporal_patch_size: int = 2) -> int:
    """How many frames to sample from a video (reference
    qwen2_vl_processing.py:853 smart_nframes)."""
    n = total_frames / video_fps * fps
    n = min(max(n, min_frames), max_frames, total_frames)
    return max(int(round(n / temporal_patch_size)) * temporal_patch_size,
               temporal_patch_size)


@dataclasses.dataclass
class Qwen2VLImageProcessor(BaseImageProcessor):
    model_type = "qwen2_vl_image_processor"
    patch_size: int = 14
    merge_size: int = 2
    temporal_patch_size: int = 2
    min_pixels: int = 56 * 56
    max_pixels: int = 14 * 14 * 4 * 1280
    image_mean: Tuple[float, ...] = OPENAI_CLIP_MEAN
    image_std: Tuple[float, ...] = OPENAI_CLIP_STD
    do_normalize: bool = True
    pad_to_multiple: int = 256  # static-shape bucket for the packed patches

    def __call__(self, images) -> dict:
        if not isinstance(images, (list, tuple)):
            images = [images]
        all_patches, grids = [], []
        for im in images:
            arr = to_numpy_rgb(im).astype(np.float32)
            h, w = arr.shape[:2]
            nh, nw = smart_resize(h, w, self.patch_size * self.merge_size,
                                  self.min_pixels, self.max_pixels)
            arr = resize(arr.astype(np.uint8), (nh, nw)).astype(np.float32) / 255.0
            if self.do_normalize:
                arr = normalize(arr, self.image_mean, self.image_std)
            patches, grid = extract_patches(arr, self.patch_size, self.merge_size,
                                            self.temporal_patch_size)
            all_patches.append(patches)
            grids.append(grid)
        pixel = np.concatenate(all_patches, axis=0)
        grid_thw = np.asarray(grids, np.int64)
        pos_hw = vision_patch_positions(grids, self.merge_size)
        segments = np.concatenate([
            np.full((g[0] * g[1] * g[2],), i + 1, np.int32) for i, g in enumerate(grids)])
        # pad to a static bucket (pads get segment 0 => masked out)
        n = pixel.shape[0]
        m4 = self.merge_size ** 2
        bucket = max(self.pad_to_multiple, m4)
        padded = -(-n // bucket) * bucket
        if padded != n:
            pixel = np.pad(pixel, ((0, padded - n), (0, 0)))
            pos_hw = np.pad(pos_hw, ((0, padded - n), (0, 0)))
            segments = np.pad(segments, (0, padded - n))
        return {
            "pixel_patches": pixel[None],
            "patch_pos_hw": pos_hw[None].astype(np.int32),
            "patch_segments": segments[None],
            "image_grid_thw": grid_thw,
            "num_patches": n,
        }


class Qwen2VLProcessor:
    """Text+image bundle (reference Qwen2VLProcessor qwen2_vl_processing.py:102)."""

    image_placeholder = "<|image_pad|>"

    def __init__(self, image_processor: Optional[Qwen2VLImageProcessor] = None,
                 tokenizer=None, image_token_id: int = 151655):
        self.image_processor = image_processor or Qwen2VLImageProcessor()
        self.tokenizer = tokenizer
        self.image_token_id = image_token_id

    def __call__(self, text: str, images=None, **kwargs) -> dict:
        out = {}
        n_placeholder_tokens = []
        if images is not None:
            out = self.image_processor(images)
            m4 = self.image_processor.merge_size ** 2
            n_placeholder_tokens = [int(np.prod(g)) // m4 for g in out["image_grid_thw"]]
        if self.tokenizer is not None:
            for n in n_placeholder_tokens:
                text = text.replace(self.image_placeholder, "<IMG>" * n, 1)
            enc = self.tokenizer(text, **kwargs)
            out.update(enc)
        else:
            out["num_image_tokens"] = n_placeholder_tokens
        return out
