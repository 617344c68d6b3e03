"""VaeImageProcessor (reference ppdiffusers/ppdiffusers/image_processor.py:652):
PIL/numpy/jax conversions around the VAE. NHWC everywhere."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union

import numpy as np

from ..core.config import BaseConfig

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None


@dataclasses.dataclass
class VaeImageProcessor(BaseConfig):
    config_name = "preprocessor_config.json"
    do_resize: bool = True
    vae_scale_factor: int = 8
    resample: str = "bicubic"
    do_normalize: bool = True

    def preprocess(self, image) -> np.ndarray:
        """PIL/np (H,W,3) or list -> (B,H,W,3) float32 in [-1, 1]."""
        from ..processors.image_utils import to_numpy_rgb

        if not isinstance(image, (list, tuple)):
            image = [image]
        arrs = []
        for im in image:
            arr = to_numpy_rgb(im).astype(np.float32)
            if arr.max() > 1.5:
                arr = arr / 255.0
            h, w = arr.shape[:2]
            if self.do_resize and (h % self.vae_scale_factor or w % self.vae_scale_factor):
                from ..processors.image_utils import resize

                nh = h - h % self.vae_scale_factor
                nw = w - w % self.vae_scale_factor
                arr = resize((arr * 255).astype(np.uint8), (nh, nw), self.resample).astype(np.float32) / 255.0
            arrs.append(arr)
        batch = np.stack(arrs)
        if self.do_normalize:
            batch = batch * 2.0 - 1.0
        return batch

    def postprocess(self, image, output_type: str = "pil"):
        """(B,H,W,C) float in [-1,1] -> pil | np | array."""
        image = np.asarray(image, dtype=np.float32)
        if output_type == "latent":
            return image
        image = np.clip(image / 2 + 0.5, 0.0, 1.0)
        if output_type == "np":
            return image
        image = (image * 255).round().astype(np.uint8)
        if output_type == "pil" and Image is not None:
            return [Image.fromarray(im) for im in image]
        return image
