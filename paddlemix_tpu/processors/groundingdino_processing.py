"""GroundingDINO image + text processing.

Rebuild of the reference's processors (paddlemix/processors/
groundingdino_processing.py:36-334): aspect-preserving resize (shortest edge
``size``, longest capped at ``max_size``), ImageNet normalize, batch padding
with a validity mask, and the special-token segment attention masks /
per-phrase position ids the text encoder consumes.

TPU twists: the padded canvas snaps to a small bucket set so jit compiles a
handful of shapes instead of one per image, and the segment mask/position-id
construction is vectorized numpy (cummax over special-token indicators)
instead of the reference's per-index Python loop."""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .base import BaseImageProcessor, ProcessorMixin
from .image_utils import IMAGENET_MEAN, IMAGENET_STD, normalize, resize, to_numpy_rgb


def _size_with_aspect_ratio(h: int, w: int, size: int,
                            max_size: Optional[int]) -> Tuple[int, int]:
    if max_size is not None:
        if max(h, w) / min(h, w) * size > max_size:
            size = int(round(max_size * min(h, w) / max(h, w)))
    if (w <= h and w == size) or (h <= w and h == size):
        return h, w
    if w < h:
        return int(size * h / w), size
    return size, int(size * w / h)


@dataclasses.dataclass
class GroundingDinoImageProcessor(BaseImageProcessor):
    model_type = "groundingdino_image_processor"
    do_resize: bool = True
    size: int = 800
    max_size: int = 1333
    do_normalize: bool = True
    image_mean: Tuple[float, ...] = IMAGENET_MEAN
    image_std: Tuple[float, ...] = IMAGENET_STD
    do_nested: bool = True
    pad_multiple: int = 64  # bucket padded canvases for compile reuse

    def __call__(self, images) -> Tuple[np.ndarray, np.ndarray]:
        if not isinstance(images, (list, tuple)):
            images = [images]
        arrs = []
        for im in images:
            arr = to_numpy_rgb(im)
            if self.do_resize:
                h, w = arr.shape[:2]
                th, tw = _size_with_aspect_ratio(h, w, self.size, self.max_size)
                arr = resize(arr, (th, tw), "bilinear")
            arr = arr.astype(np.float32) / 255.0
            if self.do_normalize:
                arr = normalize(arr, self.image_mean, self.image_std)
            arrs.append(arr)
        if not self.do_nested:
            return np.stack(arrs), np.zeros(
                (len(arrs),) + arrs[0].shape[:2], bool)
        mh = max(a.shape[0] for a in arrs)
        mw = max(a.shape[1] for a in arrs)
        m = self.pad_multiple
        mh, mw = -(-mh // m) * m, -(-mw // m) * m
        batch = np.zeros((len(arrs), mh, mw, 3), np.float32)
        mask = np.ones((len(arrs), mh, mw), bool)  # True = padding
        for i, a in enumerate(arrs):
            batch[i, : a.shape[0], : a.shape[1]] = a
            mask[i, : a.shape[0], : a.shape[1]] = False
        return batch, mask


@dataclasses.dataclass
class GroundingDinoTextProcessor(BaseImageProcessor):
    """Caption normalization + the special-token segment machinery
    (reference GroundingDinoTextProcessor,
    groundingdino_processing.py:86-183)."""

    model_type = "groundingdino_text_processor"
    max_words: int = 256

    @staticmethod
    def pre_caption(caption: str) -> str:
        caption = caption.strip()
        if not caption.endswith("."):
            caption = caption + "."
        return caption

    def __call__(self, input_ids, special_tokens_list) -> Dict[str, np.ndarray]:
        ids = np.asarray(input_ids, np.int64)
        if ids.ndim == 1:
            ids = ids[None]
        n = min(ids.shape[1], self.max_words)
        ids = ids[:, :n]
        masks, pos = self.generate_masks_with_special_tokens(
            ids, special_tokens_list)
        return {"input_ids": ids,
                "attention_mask": (ids != 0).astype(np.int64),
                "position_ids": pos,
                "text_self_attention_masks": masks}

    @staticmethod
    def generate_masks_with_special_tokens(input_ids: np.ndarray,
                                           special_tokens_list):
        """Block-diagonal self-attention over phrases delimited by special
        tokens, and positions restarting inside each phrase
        (reference groundingdino_processing.py:142-183). Vectorized: segment
        id = inclusive cumsum of the special-token indicator; token j of a
        phrase attends exactly to its phrase plus the delimiter that closes
        it, matching the reference's previous_col+1..col span."""
        bs, n = input_ids.shape
        special = np.zeros((bs, n), bool)
        for tok in special_tokens_list:
            special |= input_ids == tok
        idx = np.arange(n)[None, :]
        # segment index: number of special tokens strictly before position j
        # -> a phrase's tokens share a segment with the delimiter closing it
        seg = np.cumsum(special, axis=1) - special.astype(np.int64)
        # positions restart after each special token
        seg_start = np.where(special, idx + 1, 0)
        seg_start = np.maximum.accumulate(
            np.concatenate([np.zeros((bs, 1), np.int64), seg_start[:, :-1]],
                           axis=1), axis=1)
        pos = idx - seg_start
        # self-only tokens, exactly the reference's untouched/boundary cases:
        # position 0 ([CLS]), a special token in the last slot, and everything
        # after the last special token (trailing pads form no phrase)
        last_special = np.where(special.any(axis=1),
                                (n - 1) - np.argmax(special[:, ::-1], axis=1),
                                -1)[:, None]
        only_self = (idx == 0) | (idx > last_special) | \
            (special & (idx == n - 1))
        seg_attn = seg[:, :, None] == seg[:, None, :]
        eye = np.eye(n, dtype=bool)[None]
        attn = np.where(only_self[:, :, None] | only_self[:, None, :],
                        eye, seg_attn)
        attn |= eye
        pos = np.where(only_self, 0, pos)
        return attn, pos.astype(np.int64)


class GroundingDinoProcessor(ProcessorMixin):
    """images + caption -> (image_tensor, mask, tokenized_out)
    (reference GroundingDinoProcessor, groundingdino_processing.py:36-83)."""

    image_processor_class = GroundingDinoImageProcessor

    def __init__(self, image_processor=None, text_processor=None,
                 tokenizer=None, **kw):
        super().__init__(
            image_processor=image_processor or GroundingDinoImageProcessor(),
            tokenizer=tokenizer, **kw)
        self.text_processor = text_processor or GroundingDinoTextProcessor()
        self.prompt = None

    def __call__(self, images=None, text: str = None, **kwargs):
        if images is None or text is None:
            raise ValueError("both images and text are required")
        self.prompt = self.text_processor.pre_caption(text)
        enc = self.tokenizer(self.prompt)
        input_ids = enc["input_ids"] if isinstance(enc, dict) else enc.input_ids
        special = self.special_token_ids()
        tokenized = self.text_processor(np.asarray([input_ids]), special)
        image_tensor, mask = self.image_processor(images)
        return image_tensor, mask, tokenized

    def special_token_ids(self) -> List[int]:
        toks = ["[CLS]", "[SEP]", ".", "?"]
        tok = self.tokenizer
        if hasattr(tok, "convert_tokens_to_ids"):
            return [t for t in tok.convert_tokens_to_ids(toks) if t is not None]
        ids = []
        for t in toks:
            enc = tok.encode(t)
            ids.extend(i for i in (enc if isinstance(enc, list) else enc.ids))
        return sorted(set(ids))

    def decode(self, posmap: np.ndarray) -> str:
        """Token span -> phrase string for a detected box's text mask."""
        posmap = np.asarray(posmap)
        assert posmap.ndim == 1, "posmap must be 1-dim"
        enc = self.tokenizer(self.prompt)
        input_ids = enc["input_ids"] if isinstance(enc, dict) else enc.input_ids
        token_ids = [int(input_ids[i]) for i in np.nonzero(posmap)[0]
                     if i < len(input_ids)]
        return self.tokenizer.decode(token_ids)
