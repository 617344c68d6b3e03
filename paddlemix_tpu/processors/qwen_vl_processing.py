"""Qwen-VL (v1) processing.

Rebuild of the reference's QwenVLProcessor/QwenVLImageProcessor
(paddlemix/processors/qwen_vl_processing.py:36-196): a 448x448 bicubic
resize + CLIP-stat normalize image path, the ``from_list_format`` query
assembly (``Picture N: <img>path</img>\n`` runs), and the ChatML train
preprocess that masks system/user turns to -100 while keeping assistant
spans as targets.

Differences by design: images come out NHWC float32 (TPU conv layout, not
NCHW paddle tensors) and the tokenizer is any injected HF-compatible
tokenizer exposing ``__call__ -> input_ids`` plus the ChatML special ids.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from .base import BaseImageProcessor, ProcessorMixin
from .image_utils import normalize, resize, to_numpy_rgb

IGNORE_TOKEN_ID = -100
_IMG_TAG = re.compile(r"<img>(.*?)</img>")

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _load_image(image):
    """Accept file paths as the reference processors do
    (qwen_vl_processing.py:173-181)."""
    if isinstance(image, str):
        from PIL import Image

        return Image.open(image).convert("RGB")
    return image


class QwenVLImageProcessor(BaseImageProcessor):
    """448x448 bicubic + CLIP normalize (reference
    qwen_vl_processing.py:158-196 QwenVLImageProcessor.image_transform)."""

    image_size: int = 448
    image_mean: Sequence[float] = CLIP_MEAN
    image_std: Sequence[float] = CLIP_STD

    def __call__(self, images) -> np.ndarray:
        if not isinstance(images, (list, tuple)):
            images = [images]
        out = []
        for image in images:
            arr = to_numpy_rgb(_load_image(image))
            arr = resize(arr, (self.image_size, self.image_size),
                         resample="bicubic")
            arr = normalize(arr / 255.0, self.image_mean, self.image_std)
            out.append(arr.astype(np.float32))
        return np.stack(out, axis=0)  # (N, H, W, 3)


class QwenVLProcessor(ProcessorMixin):
    """Query/record assembly + ChatML train targets (reference
    qwen_vl_processing.py:36-152)."""

    image_processor_class = QwenVLImageProcessor

    def __init__(self, image_processor=None, tokenizer=None,
                 max_len: int = 2048, **kw):
        super().__init__(
            image_processor=image_processor or QwenVLImageProcessor(),
            tokenizer=tokenizer, **kw)
        self.max_len = max_len

    # -- reference QWenTokenizer.from_list_format (tokenization_qwen.py):
    # interleave numbered picture tags and text runs
    @staticmethod
    def from_list_format(query: List[dict]) -> str:
        parts, num_images = [], 0
        for ele in query:
            if "image" in ele:
                num_images += 1
                parts.append(f"Picture {num_images}: <img>{ele['image']}</img>\n")
            elif "text" in ele:
                parts.append(ele["text"])
            else:
                raise ValueError(f"unsupported query element keys: {sorted(ele)}")
        return "".join(parts)

    def __call__(self, query: Optional[List[dict]] = None,
                 record: Optional[Union[List[dict], dict, str]] = None,
                 mode: Optional[str] = None) -> Dict[str, np.ndarray]:
        if query is None and record is None:
            raise ValueError("You have to specify query or record.")
        if query is None:
            query = record
        if mode == "train":
            return self.train_preprocess(query)

        images = [ele["image"] for ele in query if "image" in ele]
        text = self.from_list_format(query)
        ids = np.asarray([self.tokenizer(text)["input_ids"]], np.int32)
        inputs: Dict[str, np.ndarray] = {"input_ids": ids, "images": None}
        if images:
            inputs["images"] = self.image_processor(images)
        return inputs

    def train_preprocess(self, sources,
                         system_message: str = "You are a helpful assistant."):
        """ChatML assembly with -100 masking of everything but assistant
        replies (reference qwen_vl_processing.py:77-132). ``sources`` is the
        raw conversation string (or a dict with a "conversations" string)
        carrying <|im_start|>/<|im_end|> turn markers and optional
        ``<img>path</img>`` tags."""
        tok = self.tokenizer
        im_start = getattr(tok, "im_start_id", None)
        im_end = getattr(tok, "im_end_id", None)
        if im_start is None:
            im_start = tok.convert_tokens_to_ids("<|im_start|>")
        if im_end is None:
            im_end = tok.convert_tokens_to_ids("<|im_end|>")
        nl = list(tok("\n")["input_ids"])
        _system = list(tok("system")["input_ids"]) + nl

        if isinstance(sources, dict) and "conversations" in sources:
            sources = sources["conversations"]
        image_path = _IMG_TAG.findall(sources) if "<img>" in sources else []

        input_id: List[int] = []
        target: List[int] = []
        system = [im_start] + _system + list(tok(system_message)["input_ids"]) \
            + [im_end] + nl
        input_id += system
        target += [im_start] + [IGNORE_TOKEN_ID] * (len(system) - 3) \
            + [im_end] + nl

        conv = list(tok(sources)["input_ids"])
        input_id += conv
        conv_arr = np.asarray(conv)
        starts = np.where(conv_arr == im_start)[0]
        ends = np.where(conv_arr == im_end)[0]
        asst_prefix_len = len(tok("<|im_start|>assistant")["input_ids"])
        for i in range(0, min(len(starts), len(ends)) - 1, 2):
            q = (starts[i], ends[i])
            a = (starts[i + 1], ends[i + 1])
            # user turn: fully masked
            target += [im_start] + [IGNORE_TOKEN_ID] * (q[1] - q[0] - 1) \
                + [im_end] + nl
            # assistant turn: mask the role header, keep the reply tokens
            reply = conv[a[0]: a[1] + 2][asst_prefix_len + 1: -2]
            target += [im_start] + [IGNORE_TOKEN_ID] * asst_prefix_len \
                + list(reply) + [im_end] + nl
        target += [IGNORE_TOKEN_ID] * (len(input_id) - len(target))

        inputs = {
            "input_ids": np.asarray(input_id[: self.max_len], np.int32),
            "labels": np.asarray(target[: self.max_len], np.int32),
        }
        if image_path:
            inputs["images"] = image_path
        return inputs

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, ids, **kwargs):
        ids = np.asarray(ids)
        if ids.ndim > 1:
            ids = ids[0]
        return self.tokenizer.decode(list(ids), **kwargs)
