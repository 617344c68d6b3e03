"""LLaVA / LLaVA-NeXT processing, including "anyres" dynamic resolution.

Rebuild of the reference's LLaVA-NeXT pipeline
(paddlemix/processors/llava_next_processing.py and
paddlemix/models/llava/mm_utils.py:55-181): grid-pinpoint selection
(`select_best_resolution`), aspect-preserving resize+pad, tiling into
vision-tower-sized crops plus a global resize, and the token-count math for
the spatial_unpad feature merge — so the prompt carries EXACTLY as many image
placeholder tokens as the model's anyres splice will produce.

TPU note: all of this is host-side numpy (it runs in the data plane); the
device-side feature merge lives in models/llava/modeling.py
(merge_anyres_features) with static shapes per (image_size, pinpoint) pair.
"""

from __future__ import annotations

import ast
import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .clip_processing import CLIPImageProcessor
from .image_utils import resize, to_numpy_rgb

# LLaVA-1.6 default grid pinpoints ((w, h) pairs), as shipped in the
# llava-v1.6 checkpoints' config.json image_grid_pinpoints
LLAVA_16_GRID_PINPOINTS: Tuple[Tuple[int, int], ...] = (
    (336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008))


def _as_resolutions(grid_pinpoints) -> List[Tuple[int, int]]:
    if isinstance(grid_pinpoints, str):
        grid_pinpoints = ast.literal_eval(grid_pinpoints)
    return [tuple(p) for p in grid_pinpoints]


def select_best_resolution(original_size: Tuple[int, int],
                           possible_resolutions) -> Tuple[int, int]:
    """Pick the pinpoint maximizing effective resolution then minimizing
    waste (reference mm_utils.py:55-82). Sizes are (width, height)."""
    ow, oh = original_size
    best, best_eff, best_waste = None, 0, float("inf")
    for w, h in _as_resolutions(possible_resolutions):
        scale = min(w / ow, h / oh)
        eff = min(int(ow * scale) * int(oh * scale), ow * oh)
        waste = w * h - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (w, h), eff, waste
    return best


def resize_and_pad_image(image: np.ndarray,
                         target_resolution: Tuple[int, int]) -> np.ndarray:
    """Aspect-preserving resize then center-pad with black
    (reference mm_utils.py:85-115). target_resolution is (width, height)."""
    oh, ow = image.shape[:2]
    tw, th = target_resolution
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = resize(image, (nh, nw))
    out = np.zeros((th, tw, image.shape[2]), dtype=resized.dtype)
    y, x = (th - nh) // 2, (tw - nw) // 2
    out[y:y + nh, x:x + nw] = resized
    return out


def divide_to_patches(image: np.ndarray, patch_size: int) -> List[np.ndarray]:
    """Row-major tiling (reference mm_utils.py:118-135)."""
    h, w = image.shape[:2]
    return [image[i:i + patch_size, j:j + patch_size]
            for i in range(0, h, patch_size)
            for j in range(0, w, patch_size)]


def get_anyres_image_grid_shape(image_size: Tuple[int, int], grid_pinpoints,
                                patch_size: int) -> Tuple[int, int]:
    """(tiles_w, tiles_h) for an original (width, height)
    (reference mm_utils.py:138-153)."""
    w, h = select_best_resolution(image_size, grid_pinpoints)
    return w // patch_size, h // patch_size


def unpad_hw(orig_size: Tuple[int, int], cur_hw: Tuple[int, int]) -> Tuple[int, int, int, int]:
    """Feature-grid unpadding arithmetic (reference base_model.py:101-124
    unpad_image): returns (pad_h, h_kept, pad_w, w_kept) for a feature grid of
    (rows, cols) = cur_hw covering an original (width, height) image."""
    ow, oh = orig_size
    ch, cw = cur_hw
    original_ar = ow / oh
    current_ar = cw / ch
    if original_ar > current_ar:
        new_h = int(oh * (cw / ow))
        pad = (ch - new_h) // 2
        return pad, ch - 2 * pad, 0, cw
    new_w = int(ow * (ch / oh))
    pad = (cw - new_w) // 2
    return 0, ch, pad, cw - 2 * pad


def anyres_num_tokens(image_size: Tuple[int, int], grid_pinpoints,
                      vision_image_size: int, vision_patch_size: int,
                      mm_patch_merge_type: str = "spatial_unpad") -> int:
    """Number of spliced tokens the anyres merge produces for an original
    (width, height) — must match merge_anyres_features exactly."""
    side = vision_image_size // vision_patch_size
    base = side * side
    nw, nh = get_anyres_image_grid_shape(image_size, grid_pinpoints,
                                         vision_image_size)
    rows, cols = nh * side, nw * side
    if "unpad" in mm_patch_merge_type:
        _, hk, _, wk = unpad_hw(image_size, (rows, cols))
        return base + hk * (wk + 1)
    return base + rows * cols


def process_anyres_image(image, image_processor: CLIPImageProcessor,
                         grid_pinpoints) -> Tuple[np.ndarray, Tuple[int, int]]:
    """(1 + n_tiles, H, W, 3) float32 crops — global resize first, then the
    tiles of the best-fit padded canvas (reference mm_utils.py:156-181) —
    plus the original (width, height)."""
    arr = to_numpy_rgb(image)
    oh, ow = arr.shape[:2]
    crop = image_processor.crop_size
    best = select_best_resolution((ow, oh), grid_pinpoints)
    padded = resize_and_pad_image(arr, best)
    patches = divide_to_patches(padded, crop)
    global_resize = resize(arr, (image_processor.size, image_processor.size))
    stacked = [image_processor([p])["pixel_values"][0]
               for p in [global_resize] + patches]
    return np.stack(stacked, axis=0), (ow, oh)


@dataclasses.dataclass
class LlavaProcessor:
    """Prompt + image processing for LLaVA 1.5 ("square"/"pad") and
    LLaVA-NeXT ("anyres"): expands each "<image>" in the prompt to the exact
    placeholder-token count of the chosen resolution path."""

    model_type = "llava_processor"
    image_processor_class = CLIPImageProcessor
    image_processor: Optional[CLIPImageProcessor] = None
    image_aspect_ratio: str = "square"  # "square" | "pad" | "anyres"
    image_grid_pinpoints: Sequence[Tuple[int, int]] = LLAVA_16_GRID_PINPOINTS
    mm_patch_merge_type: str = "spatial_unpad"
    vision_patch_size: int = 14
    image_token: str = "<image>"
    image_token_index: int = 32000

    def __post_init__(self):
        if self.image_processor is None:
            self.image_processor = CLIPImageProcessor(size=336, crop_size=336)
        if isinstance(self.image_processor, dict):
            self.image_processor = CLIPImageProcessor(**self.image_processor)

    def num_image_tokens(self, image_size: Tuple[int, int]) -> int:
        if self.image_aspect_ratio != "anyres":
            side = self.image_processor.crop_size // self.vision_patch_size
            return side * side
        return anyres_num_tokens(image_size, self.image_grid_pinpoints,
                                 self.image_processor.crop_size,
                                 self.vision_patch_size,
                                 self.mm_patch_merge_type)

    def process_images(self, image):
        """Returns dict(pixel_values, image_sizes, num_tokens)."""
        if self.image_aspect_ratio == "anyres":
            px, size = process_anyres_image(image, self.image_processor,
                                            self.image_grid_pinpoints)
        else:
            arr = to_numpy_rgb(image)
            if self.image_aspect_ratio == "pad":
                h, w = arr.shape[:2]
                s = max(h, w)
                mean = np.asarray(self.image_processor.image_mean) * 255.0
                canvas = np.broadcast_to(
                    mean.astype(arr.dtype), (s, s, 3)).copy()
                y, x = (s - h) // 2, (s - w) // 2
                canvas[y:y + h, x:x + w] = arr
                arr = canvas
            px = self.image_processor([arr])["pixel_values"]
            size = (arr.shape[1], arr.shape[0])
        return {"pixel_values": px, "image_sizes": [size],
                "num_tokens": self.num_image_tokens(size)}

    def expand_prompt_ids(self, token_ids: List[int], num_tokens: int,
                          marker_id: Optional[int] = None) -> np.ndarray:
        """Replace each marker (default image_token_index) with num_tokens
        placeholder ids — the splice contract of LlavaModule."""
        marker = self.image_token_index if marker_id is None else marker_id
        out = []
        for t in token_ids:
            out.extend([self.image_token_index] * num_tokens if t == marker
                       else [t])
        return np.asarray(out, np.int32)

    def __call__(self, images=None, prompt_ids: Optional[List[int]] = None):
        data = {}
        if images is not None:
            if not isinstance(images, (list, tuple)):
                images = [images]
            assert len(images) == 1 or self.image_aspect_ratio != "anyres", \
                "anyres batches one image at a time (variable token counts)"
            piece = self.process_images(images[0])
            data.update(piece)
        if prompt_ids is not None:
            n = data.get("num_tokens", 0)
            data["input_ids"] = self.expand_prompt_ids(list(prompt_ids), n)[None]
        return data
