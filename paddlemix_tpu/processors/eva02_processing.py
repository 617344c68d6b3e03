"""EVA-02 pretrain/finetune data pipeline.

Rebuild of the reference masked-image-modeling augmentation suite
(paddlemix/processors/eva02_transforms.py 621 LoC +
timm_autoaugment.py 861 LoC):

 - RandomResizedCropAndInterpolationWithTwoResolution (:158-267): ONE crop
   sampled, decoded at two resolutions (student view + frozen-teacher view);
 - MaskingGenerator (:283-352): block-wise MIM mask with aspect/size bounds;
 - DataAugmentationForEVA (:354-420): flip + two-res crop + per-view
   normalization (student: imagenet; teacher: CLIP/openai) + mask;
 - RandAugment (timm_autoaugment.py): the `rand-m9-mstd0.5-inc1` policy used
   by the EVA-02 finetune recipe, re-implemented on PIL ops.

All host-side numpy/PIL (the data plane); the device step consumes
(student_view, teacher_view, bool_masked_pos) batches.
"""

from __future__ import annotations

import dataclasses
import math
import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

from .image_utils import OPENAI_CLIP_MEAN, OPENAI_CLIP_STD, to_numpy_rgb

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


# --------------------------------------------------------- two-res crop
class RandomResizedCropAndInterpolationWithTwoResolution:
    """Sample ONE random crop, return it resized to the student size and the
    teacher size (reference eva02_transforms.py:158-267)."""

    def __init__(self, size, second_size, scale=(0.08, 1.0),
                 ratio=(3.0 / 4.0, 4.0 / 3.0), rng: Optional[random.Random] = None):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.second_size = ((second_size, second_size)
                            if isinstance(second_size, int) else tuple(second_size))
        self.scale, self.ratio = scale, ratio
        self.rng = rng or random.Random()

    def get_params(self, img):
        w, h = img.size
        area = h * w
        for _ in range(10):
            target_area = self.rng.uniform(*self.scale) * area
            log_ratio = (math.log(self.ratio[0]), math.log(self.ratio[1]))
            aspect = math.exp(self.rng.uniform(*log_ratio))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if cw <= w and ch <= h:
                top = self.rng.randint(0, h - ch)
                left = self.rng.randint(0, w - cw)
                return top, left, ch, cw
        # fallback: center crop to in-ratio box (reference :120-131)
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            ch, cw = h, int(round(h * self.ratio[1]))
        else:
            cw, ch = w, h
        return (h - ch) // 2, (w - cw) // 2, ch, cw

    def __call__(self, img: Image.Image):
        top, left, ch, cw = self.get_params(img)
        box = (left, top, left + cw, top + ch)
        first = img.resize(self.size, Image.BICUBIC, box=box)
        second = img.resize(self.second_size, Image.LANCZOS, box=box)
        return first, second


# --------------------------------------------------------------- MIM mask
class MaskingGenerator:
    """Block-wise masking (reference eva02_transforms.py:283-352): draw
    log-uniform-aspect blocks until `num_masking_patches` cells are set."""

    def __init__(self, input_size, num_masking_patches, min_num_patches=4,
                 max_num_patches=None, min_aspect=0.3, max_aspect=None,
                 rng: Optional[random.Random] = None):
        if not isinstance(input_size, tuple):
            input_size = (input_size,) * 2
        self.height, self.width = input_size
        self.num_patches = self.height * self.width
        self.num_masking_patches = num_masking_patches
        self.min_num_patches = min_num_patches
        self.max_num_patches = (num_masking_patches if max_num_patches is None
                                else max_num_patches)
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.rng = rng or random.Random()

    def _mask(self, mask, max_mask_patches):
        delta = 0
        for _ in range(10):
            target_area = self.rng.uniform(self.min_num_patches, max_mask_patches)
            aspect = math.exp(self.rng.uniform(*self.log_aspect_ratio))
            h = int(round(math.sqrt(target_area * aspect)))
            w = int(round(math.sqrt(target_area / aspect)))
            if w < self.width and h < self.height:
                top = self.rng.randint(0, self.height - h - 1)
                left = self.rng.randint(0, self.width - w - 1)
                num_masked = mask[top:top + h, left:left + w].sum()
                if 0 < h * w - num_masked <= max_mask_patches:
                    for i in range(top, top + h):
                        for j in range(left, left + w):
                            if mask[i, j] == 0:
                                mask[i, j] = 1
                                delta += 1
                if delta > 0:
                    break
        return delta

    def __call__(self) -> np.ndarray:
        mask = np.zeros((self.height, self.width), np.int32)
        mask_count = 0
        while mask_count < self.num_masking_patches:
            max_mask_patches = self.num_masking_patches - mask_count
            max_mask_patches = min(max_mask_patches, self.max_num_patches)
            delta = self._mask(mask, max_mask_patches)
            if delta == 0:
                break
            mask_count += delta
        return mask


# -------------------------------------------------------- timm RandAugment
_FILL = (124, 116, 104)


def _rotate(img, deg):
    return img.rotate(deg, fillcolor=_FILL)


def _shear_x(img, v):
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         fillcolor=_FILL)


def _shear_y(img, v):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         fillcolor=_FILL)


def _translate_x(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, v * img.size[0], 0, 1, 0), fillcolor=_FILL)


def _translate_y(img, v):
    return img.transform(img.size, Image.AFFINE,
                         (1, 0, 0, 0, 1, v * img.size[1]), fillcolor=_FILL)


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int32)
    arr = np.where(arr < thresh, np.clip(arr + add, 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


# (name, level->magnitude fn, apply fn); levels follow timm's
# `_LEVEL_DENOM = 10` with the "inc1" increasing-severity variants
def _lvl(frac):
    return lambda level: level / 10 * frac


_RAND_OPS = (
    ("AutoContrast", None, lambda im, _: ImageOps.autocontrast(im)),
    ("Equalize", None, lambda im, _: ImageOps.equalize(im)),
    ("Invert", None, lambda im, _: ImageOps.invert(im)),
    ("Rotate", _lvl(30.0), _rotate),
    ("Posterize", lambda l: 4 - int(l / 10 * 4),
     lambda im, v: ImageOps.posterize(im, max(int(v), 1))),
    ("Solarize", lambda l: 256 - int(l / 10 * 256),
     lambda im, v: ImageOps.solarize(im, int(v))),
    ("SolarizeAdd", lambda l: int(l / 10 * 110), _solarize_add),
    ("Color", _lvl(0.9), lambda im, v: ImageEnhance.Color(im).enhance(1 + v)),
    ("Contrast", _lvl(0.9),
     lambda im, v: ImageEnhance.Contrast(im).enhance(1 + v)),
    ("Brightness", _lvl(0.9),
     lambda im, v: ImageEnhance.Brightness(im).enhance(1 + v)),
    ("Sharpness", _lvl(0.9),
     lambda im, v: ImageEnhance.Sharpness(im).enhance(1 + v)),
    ("ShearX", _lvl(0.3), _shear_x),
    ("ShearY", _lvl(0.3), _shear_y),
    ("TranslateX", _lvl(0.45), _translate_x),
    ("TranslateY", _lvl(0.45), _translate_y),
)


class RandAugment:
    """timm `rand-m9-mstd0.5-inc1`-style policy (timm_autoaugment.py):
    num_layers ops drawn uniformly; magnitude gaussian-jittered (mstd) and
    randomly sign-flipped for signed ops."""

    _SIGNED = {"Rotate", "ShearX", "ShearY", "TranslateX", "TranslateY",
               "Color", "Contrast", "Brightness", "Sharpness"}

    def __init__(self, magnitude=9, num_layers=2, mstd=0.5, prob=0.5,
                 rng: Optional[random.Random] = None):
        self.magnitude, self.num_layers = magnitude, num_layers
        self.mstd, self.prob = mstd, prob
        self.rng = rng or random.Random()

    def __call__(self, img: Image.Image) -> Image.Image:
        for _ in range(self.num_layers):
            if self.rng.random() > self.prob:
                continue
            name, lvl_fn, fn = _RAND_OPS[self.rng.randrange(len(_RAND_OPS))]
            if lvl_fn is None:
                img = fn(img, None)
                continue
            mag = self.magnitude
            if self.mstd:
                mag = min(max(self.rng.gauss(mag, self.mstd), 0), 10)
            v = lvl_fn(mag)
            if name in self._SIGNED and self.rng.random() < 0.5:
                v = -v
            img = fn(img, v)
        return img


# ------------------------------------------------------- composed pipeline
@dataclasses.dataclass
class DataAugmentationForEVA:
    """Pretrain view builder (reference eva02_transforms.py:354-420):
    returns dict(pixel_values, teacher_pixel_values, bool_masked_pos)."""

    input_size: int = 224
    second_input_size: int = 224
    patch_size: int = 14
    num_mask_patches: int = 105
    min_mask_patches_per_block: int = 4
    max_mask_patches_per_block: Optional[int] = None
    hflip: float = 0.5
    student_mean: Sequence[float] = IMAGENET_INCEPTION_MEAN
    student_std: Sequence[float] = IMAGENET_INCEPTION_STD
    teacher_mean: Sequence[float] = OPENAI_CLIP_MEAN
    teacher_std: Sequence[float] = OPENAI_CLIP_STD
    seed: Optional[int] = None

    def __post_init__(self):
        self.rng = random.Random(self.seed)
        self.crop = RandomResizedCropAndInterpolationWithTwoResolution(
            self.input_size, self.second_input_size, rng=self.rng)
        grid = self.input_size // self.patch_size
        self.masking = MaskingGenerator(
            grid, num_masking_patches=self.num_mask_patches,
            min_num_patches=self.min_mask_patches_per_block,
            max_num_patches=self.max_mask_patches_per_block, rng=self.rng)

    @staticmethod
    def _norm(img, mean, std):
        arr = np.asarray(img, np.float32) / 255.0
        return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)

    def __call__(self, image) -> dict:
        img = Image.fromarray(to_numpy_rgb(image)) \
            if not isinstance(image, Image.Image) else image.convert("RGB")
        if self.rng.random() < self.hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        student, teacher = self.crop(img)
        return {
            "pixel_values": self._norm(student, self.student_mean,
                                       self.student_std),
            "teacher_pixel_values": self._norm(teacher, self.teacher_mean,
                                               self.teacher_std),
            "bool_masked_pos": self.masking().reshape(-1).astype(bool),
        }


def transforms_imagenet_train(img_size=224, auto_augment="rand-m9-mstd0.5-inc1",
                              hflip=0.5, mean=IMAGENET_DEFAULT_MEAN,
                              std=IMAGENET_DEFAULT_STD, seed=None):
    """Finetune-time transform (reference eva02_transforms.py:441-521,
    simplified to the EVA-02 recipe's knobs): random resized crop + flip +
    RandAugment + normalize. Returns a callable image -> float32 HWC."""
    rng = random.Random(seed)
    crop = RandomResizedCropAndInterpolationWithTwoResolution(
        img_size, img_size, rng=rng)
    mag = int(auto_augment.split("-m")[1].split("-")[0]) \
        if "-m" in auto_augment else 9
    ra = RandAugment(magnitude=mag, rng=rng)

    def apply(image):
        img = Image.fromarray(to_numpy_rgb(image)) \
            if not isinstance(image, Image.Image) else image.convert("RGB")
        if rng.random() < hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        img, _ = crop(img)
        img = ra(img)
        return DataAugmentationForEVA._norm(img, mean, std)

    return apply
