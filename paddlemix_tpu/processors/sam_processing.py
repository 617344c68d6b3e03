"""SAM image + prompt processing.

Rebuild of the reference's SAM processors (paddlemix/processors/
sam_processing.py:43-265): longest-side resize to ``size``, ImageNet
normalize, zero-pad to the static (size, size) canvas, and prompt
coordinate rescaling into the resized frame.

TPU twist: output is NHWC with a STATIC (size, size) spatial shape so the
image encoder jits once for every input resolution, and the processor is
stateless-per-call — original/input sizes ride in the returned dict instead
of processor attributes (the reference mutates ``self.original_size``,
which breaks pipelined prefetch)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .base import BaseImageProcessor, ProcessorMixin
from .image_utils import IMAGENET_MEAN, IMAGENET_STD, normalize, resize, to_numpy_rgb


def get_preprocess_shape(old_h: int, old_w: int, long_side: int) -> Tuple[int, int]:
    """Target (h, w) with the longest side scaled to ``long_side``
    (reference image_utils.get_preprocess_shape)."""
    scale = long_side * 1.0 / max(old_h, old_w)
    new_h, new_w = old_h * scale, old_w * scale
    return int(new_h + 0.5), int(new_w + 0.5)


@dataclasses.dataclass
class SamImageProcessor(BaseImageProcessor):
    model_type = "sam_image_processor"
    size: int = 1024
    image_mean: Tuple[float, ...] = IMAGENET_MEAN
    image_std: Tuple[float, ...] = IMAGENET_STD
    image_format: str = "RGB"

    def __call__(self, images) -> Dict[str, np.ndarray]:
        if not isinstance(images, (list, tuple)):
            images = [images]
        out, input_sizes, original_sizes = [], [], []
        for im in images:
            arr = to_numpy_rgb(im)
            if self.image_format == "BGR":
                arr = arr[..., ::-1]
            oh, ow = arr.shape[:2]
            th, tw = get_preprocess_shape(oh, ow, self.size)
            arr = resize(arr, (th, tw), "bilinear").astype(np.float32)
            arr = normalize(arr / 255.0, self.image_mean, self.image_std)
            canvas = np.zeros((self.size, self.size, 3), np.float32)
            canvas[:th, :tw] = arr
            out.append(canvas)
            input_sizes.append((th, tw))
            original_sizes.append((oh, ow))
        return {"pixel_values": np.stack(out),
                "input_size": input_sizes[0],
                "original_size": original_sizes[0]}


@dataclasses.dataclass
class SamPromptProcessor(BaseImageProcessor):
    """Rescales point/box prompts from original-image coordinates into the
    resized ``size``-canvas frame (reference SamPromptProcessor,
    sam_processing.py:108-170)."""

    model_type = "sam_prompt_processor"
    size: int = 1024

    def apply_coords(self, coords: np.ndarray,
                     original_size: Tuple[int, int]) -> np.ndarray:
        old_h, old_w = original_size
        new_h, new_w = get_preprocess_shape(old_h, old_w, self.size)
        coords = np.asarray(coords, np.float64).copy()
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords.astype(np.float32)

    def apply_boxes(self, boxes: np.ndarray,
                    original_size: Tuple[int, int]) -> np.ndarray:
        boxes = self.apply_coords(np.asarray(boxes).reshape(-1, 2, 2),
                                  original_size)
        return boxes.reshape(-1, 4)

    def __call__(self, original_size, point_coords=None, point_labels=None,
                 box=None, **kwargs) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        if point_coords is not None:
            out["point_coords"] = self.apply_coords(
                np.asarray(point_coords), original_size)[None]
            if point_labels is not None:
                out["point_labels"] = np.asarray(point_labels, np.int32)[None]
        if box is not None:
            out["boxes"] = self.apply_boxes(box, original_size)[None]
        return out


class SamProcessor(ProcessorMixin):
    """image + prompt bundle (reference SamProcessor, sam_processing.py:43).

    ``__call__(images, input_type, ...)`` keeps the reference signature;
    ``postprocess_masks`` maps low-res mask logits back to the original
    image resolution."""

    def __init__(self, image_processor=None, prompt_processor=None, **kw):
        image_processor = image_processor or SamImageProcessor()
        prompt_processor = prompt_processor or SamPromptProcessor(
            size=image_processor.size)
        super().__init__(image_processor=image_processor,
                         prompt_processor=prompt_processor, **kw)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        try:
            image_processor = SamImageProcessor.from_pretrained(path)
        except FileNotFoundError:
            image_processor = SamImageProcessor()
        return cls(image_processor=image_processor, **kwargs)

    def __call__(self, images, input_type: str = "points",
                 point_coords=None, point_labels=None, box=None, **kwargs):
        if input_type == "boxs" and box is None:
            raise ValueError("input_type='boxs' requires box")
        if input_type == "points" and point_coords is None:
            raise ValueError("input_type='points' requires point_coords")
        enc = self.image_processor(images)
        prompt = self.prompt_processor(enc["original_size"],
                                       point_coords=point_coords,
                                       point_labels=point_labels, box=box)
        enc.update(prompt)
        return enc

    def postprocess_masks(self, low_res_masks, input_size, original_size,
                          mask_threshold: float = 0.0):
        """(B, N, h, w) low-res logits -> boolean masks at original_size
        (reference sam_processing.py:88-100: upsample to the encode canvas,
        strip the pad, upsample to the original resolution)."""
        import jax
        import jax.numpy as jnp

        m = jnp.asarray(low_res_masks)
        b, n = m.shape[:2]
        size = self.image_processor.size
        m = jax.image.resize(m, (b, n, size, size), "bilinear")
        m = m[..., : input_size[0], : input_size[1]]
        m = jax.image.resize(m, (b, n) + tuple(original_size), "bilinear")
        return np.asarray(m > mask_threshold)
