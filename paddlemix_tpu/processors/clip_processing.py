"""CLIP image/text processing.

Rebuild of the reference's CLIP processors (paddlemix/processors/
clip_processing.py): resize shortest edge -> center crop -> rescale ->
normalize, emitting NHWC float32 batches."""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from .base import BaseImageProcessor, ProcessorMixin
from .image_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    center_crop,
    normalize,
    resize,
    resize_shortest_edge,
    to_numpy_rgb,
)


@dataclasses.dataclass
class CLIPImageProcessor(BaseImageProcessor):
    model_type = "clip_image_processor"
    do_resize: bool = True
    size: int = 224
    resample: str = "bicubic"
    do_center_crop: bool = True
    crop_size: int = 224
    do_rescale: bool = True
    rescale_factor: float = 1 / 255.0
    do_normalize: bool = True
    image_mean: Tuple[float, ...] = OPENAI_CLIP_MEAN
    image_std: Tuple[float, ...] = OPENAI_CLIP_STD

    def __call__(self, images) -> dict:
        if not isinstance(images, (list, tuple)):
            images = [images]
        use_native = False
        if os.environ.get("PMIX_NATIVE_PREPROCESS", "") == "1":
            from .. import native

            use_native = native.available()
        out = []
        for im in images:
            arr = to_numpy_rgb(im)
            if use_native and self.do_resize and self.do_rescale and self.do_normalize:
                # fused C++ path: resize shortest edge + crop + normalize
                h, w = arr.shape[:2]
                s = self.size / min(h, w)
                from .. import native

                arr = native.resize_normalize(arr.astype(np.uint8),
                                              (round(h * s), round(w * s)),
                                              self.image_mean, self.image_std,
                                              self.rescale_factor)
                if self.do_center_crop:
                    arr = native.center_crop(arr, (self.crop_size, self.crop_size))
                out.append(arr)
                continue
            if self.do_resize:
                arr = resize_shortest_edge(arr, self.size, self.resample)
            if self.do_center_crop:
                arr = center_crop(arr, (self.crop_size, self.crop_size))
            arr = arr.astype(np.float32)
            if self.do_rescale:
                arr = arr * self.rescale_factor
            if self.do_normalize:
                arr = normalize(arr, self.image_mean, self.image_std)
            out.append(arr)
        return {"pixel_values": np.stack(out)}


class CLIPProcessor(ProcessorMixin):
    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        from ..models.clip.tokenizer import CLIPTokenizer

        image_processor = CLIPImageProcessor.from_pretrained(path)
        tokenizer = CLIPTokenizer.from_pretrained(path)
        return cls(image_processor=image_processor, tokenizer=tokenizer)

    def __call__(self, text=None, images=None, **kwargs):
        out = {}
        if images is not None:
            out.update(self.image_processor(images))
        if text is not None:
            out.update(self.tokenizer(text, **kwargs))
        return out
