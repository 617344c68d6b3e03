"""BLIP-2 image/text processing.

Rebuild of the reference's BLIP processors (paddlemix/processors/
blip_processing.py:59-653): mode-dependent image transforms (train =
random-resized-crop + horizontal flip, eval = plain resize), caption/question
text normalization with a task prompt, and a bundling processor that pairs
pixel batches with tokenized text (seq2seq decoder ids for T5 backbones)."""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .base import BaseImageProcessor, ProcessorMixin
from .image_utils import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    normalize,
    resize,
    to_numpy_rgb,
)


@dataclasses.dataclass
class BlipImageProcessor(BaseImageProcessor):
    model_type = "blip_image_processor"
    size: int = 224
    resample: str = "bicubic"
    do_rescale: bool = True
    rescale_factor: float = 1 / 255.0
    do_normalize: bool = True
    image_mean: Tuple[float, ...] = OPENAI_CLIP_MEAN
    image_std: Tuple[float, ...] = OPENAI_CLIP_STD
    # train-mode augmentation (reference blip_processing.py:484-521)
    scale_min: float = 0.5
    scale_max: float = 1.0
    flip_prob: float = 0.5

    def random_resized_crop(self, arr: np.ndarray,
                            rng: np.random.Generator) -> np.ndarray:
        h, w = arr.shape[:2]
        area = h * w
        for _ in range(10):
            target = rng.uniform(self.scale_min, self.scale_max) * area
            ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
            ch = int(round(np.sqrt(target / ratio)))
            cw = int(round(np.sqrt(target * ratio)))
            if ch <= h and cw <= w:
                top = rng.integers(0, h - ch + 1)
                left = rng.integers(0, w - cw + 1)
                crop = arr[top: top + ch, left: left + cw]
                return resize(crop, (self.size, self.size), self.resample)
        return resize(arr, (self.size, self.size), self.resample)

    def __call__(self, images, mode: str = "eval",
                 rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
        if not isinstance(images, (list, tuple)):
            images = [images]
        rng = rng or np.random.default_rng()
        out = []
        for im in images:
            arr = to_numpy_rgb(im)
            if mode == "train":
                arr = self.random_resized_crop(arr, rng)
                if rng.random() < self.flip_prob:
                    arr = arr[:, ::-1]
            else:
                arr = resize(arr, (self.size, self.size), self.resample)
            arr = arr.astype(np.float32)
            if self.do_rescale:
                arr = arr * self.rescale_factor
            if self.do_normalize:
                arr = normalize(arr, self.image_mean, self.image_std)
            out.append(arr)
        return {"pixel_values": np.stack(out)}


@dataclasses.dataclass
class BlipTextProcessor(BaseImageProcessor):
    """Caption/question normalization with the task prompt
    (reference BlipTextProcessor, blip_processing.py:206-321)."""

    model_type = "blip_text_processor"
    prompt: str = ""
    max_words: int = 50
    do_caption: bool = True
    do_question: bool = False

    def pre_caption(self, caption: str) -> str:
        caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
        caption = re.sub(r"\s{2,}", " ", caption)
        caption = caption.rstrip("\n").strip(" ")
        words = caption.split(" ")
        if len(words) > self.max_words:
            caption = " ".join(words[: self.max_words])
        return caption

    def pre_question(self, question: str) -> str:
        question = re.sub(r"([.!\"()*#:;~])", "", question.lower())
        question = question.rstrip(" ")
        words = question.split(" ")
        if len(words) > self.max_words:
            question = " ".join(words[: self.max_words])
        return question

    def __call__(self, text, do_caption: Optional[bool] = None,
                 do_question: Optional[bool] = None,
                 mode: str = "train") -> List[str]:
        do_caption = self.do_caption if do_caption is None else do_caption
        do_question = self.do_question if do_question is None else do_question
        if do_caption == do_question:
            raise ValueError("exactly one of do_caption/do_question")
        if not isinstance(text, (list, tuple)):
            text = [text]
        if do_caption:
            results = [self.prompt + self.pre_caption(t) for t in text]
        else:
            results = [self.prompt.format(self.pre_question(t)) for t in text]
        if mode == "train":
            results = [r + "\n" for r in results]
        return results


class Blip2Processor(ProcessorMixin):
    """images + text -> model inputs (reference Blip2Processor,
    blip_processing.py:59-204). For T5 backbones, ``text`` may be a dict
    {"input": ..., "output": ...} producing decoder ids too."""

    def __init__(self, image_processor=None, text_processor=None,
                 tokenizer=None, is_t5: bool = False, **kw):
        super().__init__(
            image_processor=image_processor or BlipImageProcessor(),
            tokenizer=tokenizer, **kw)
        self.text_processor = text_processor or BlipTextProcessor()
        self.is_t5 = is_t5

    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        from ..utils.tokenizer import load_tokenizer

        try:
            image_processor = BlipImageProcessor.from_pretrained(path)
        except FileNotFoundError:
            image_processor = BlipImageProcessor()
        try:
            tokenizer = load_tokenizer(path)
        except FileNotFoundError:
            tokenizer = None
        return cls(image_processor=image_processor, tokenizer=tokenizer,
                   **kwargs)

    def __call__(self, images=None, text=None, max_length: int = 32,
                 mode: str = "train", **kwargs):
        if images is None and text is None:
            raise ValueError("You have to specify either images or text.")
        enc: Dict[str, np.ndarray] = {}
        if images is not None:
            enc.update(self.image_processor(images, mode=mode))
        if text is not None:
            if self.is_t5 and isinstance(text, dict):
                inp = self.tokenizer(self.text_processor(text["input"], mode=mode),
                                     max_length=max_length)
                out = self.tokenizer(self.text_processor(text["output"], mode=mode),
                                     max_length=max_length)
                enc.update(inp)
                enc["decoder_input_ids"] = out["input_ids"]
                enc["decoder_attention_mask"] = out["attention_mask"]
            else:
                enc.update(self.tokenizer(self.text_processor(text, mode=mode),
                                          max_length=max_length))
        return enc

    def batch_decode(self, sequences, **kwargs):
        return [self.tokenizer.decode(np.asarray(s).tolist(), **kwargs)
                for s in sequences]

    def decode(self, ids, **kwargs):
        return self.tokenizer.decode(np.asarray(ids).tolist(), **kwargs)
