"""InternLM-XComposer2 processing.

Rebuild of the reference's InternLMXComposer2Processor /
ImageProcessor / TextProcessor
(paddlemix/processors/internlm_xcomposer2_processing.py:32-233): the
``[UNUSED_TOKEN_146]user/assistant`` conversation template, interleaved
``<ImageHere>`` splitting into token runs (the model splices vision
embeddings between them), 224px bicubic + CLIP-normalize images, and the
92542-delimited target masking used for SFT.

Images come out NHWC float32 (TPU layout); the tokenizer is any injected
HF-compatible tokenizer."""

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

# reference internlm_xcomposer2_processing.py:139-160 mask_human_targets
END_OF_ANSWER_ID = 92542  # [UNUSED_TOKEN_145]
EOS_ID = 2


def _load_image(image):
    """Accept file paths as the reference processors do
    (qwen_vl_processing.py:173-181)."""
    if isinstance(image, str):
        from PIL import Image

        return Image.open(image).convert("RGB")
    return image


class InternLMXComposer2ImageProcessor(BaseImageProcessor):
    """resize(image_size) bicubic + CLIP normalize (reference
    internlm_xcomposer2_processing.py:185-212)."""

    image_size: int = 224
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


class InternLMXComposer2TextProcessor:
    """Two-turn conversation template (reference
    internlm_xcomposer2_processing.py:215-233)."""

    END_HUMAN = "[UNUSED_TOKEN_145]\n"
    END_BOT = "[UNUSED_TOKEN_145]\n"

    def __call__(self, sources: Sequence[str]) -> str:
        return ("[UNUSED_TOKEN_146]user\n" + sources[0].strip()
                + self.END_HUMAN
                + "[UNUSED_TOKEN_146]assistant\n" + sources[1].strip()
                + self.END_BOT + "</s>")


class InternLMXComposer2Processor(ProcessorMixin):
    image_processor_class = InternLMXComposer2ImageProcessor
    image_tag = "<ImageHere>"

    def __init__(self, image_processor=None, tokenizer=None,
                 max_length: int = 4096, **kw):
        super().__init__(
            image_processor=image_processor or InternLMXComposer2ImageProcessor(),
            tokenizer=tokenizer, **kw)
        self.max_length = max_length
        self.text_processor = InternLMXComposer2TextProcessor()

    def __call__(self, query=None, record=None, mode: Optional[str] = None):
        if query is None and record is None:
            raise ValueError("You have to specify query or record.")
        if query is None:
            query = record
        if mode == "train":
            return self.train_preprocess(query)
        images = [ele["image"] for ele in query if "image" in ele]
        text = "".join(ele.get("text", "") for ele in query)
        inputs: Dict[str, object] = {
            "input_ids": np.asarray([self.tokenizer(text)["input_ids"]],
                                    np.int32)}
        if images:
            inputs["images"] = self.image_processor(images)
        return inputs

    def train_preprocess(self, sources) -> Dict[str, object]:
        """Template + interleave split + image load (reference
        internlm_xcomposer2_processing.py:70-106)."""
        if isinstance(sources, dict) and "conversations" in sources:
            sources = self.text_processor(sources["conversations"][0])
        image_path = _IMG_TAG.findall(sources) if "<img>" in sources else []

        inputs: Dict[str, object] = {"input_text": sources}
        if image_path:
            tokens, text = self.interleav_wrap(sources, image_path)
            inputs["input_text"] = text
            inputs["input_tokens"] = tokens
            inputs["images"] = self.image_processor(image_path)
        else:
            ids = self.tokenizer(sources)["input_ids"][: self.max_length]
            inputs["input_tokens"] = [np.asarray([ids], np.int32)]
        return inputs

    def interleav_wrap(self, text: str, img_path_list: List[str]):
        """Replace each ``<img>path</img>`` with the split tag and tokenize
        the text runs between images; only the first run keeps BOS
        (reference internlm_xcomposer2_processing.py:108-124)."""
        for p in img_path_list:
            text = text.replace(f"<img>{p}</img>", self.image_tag)
        parts = text.split(self.image_tag)
        wrap_tokens, need_bos = [], True
        for part in parts:
            if not part:
                continue
            ids = self.tokenizer(part, add_special_tokens=need_bos)["input_ids"]
            need_bos = False
            wrap_tokens.append(np.asarray([ids], np.int32))
        return wrap_tokens, text

    def text2emb(self, text: str, add_special: bool = False):
        ids = self.tokenizer(text, add_special_tokens=add_special)["input_ids"]
        ids = np.asarray([ids[: self.max_length]], np.int32)
        return ids, self.mask_human_targets(ids)

    @staticmethod
    def mask_human_targets(input_ids: np.ndarray) -> np.ndarray:
        """Mask user turns between [UNUSED_TOKEN_145] delimiters and
        everything after EOS (reference
        internlm_xcomposer2_processing.py:139-160): even-numbered delimiter
        spans are human, odd are assistant."""
        targets = np.array(input_ids, copy=True)
        for bs in range(input_ids.shape[0]):
            ids = input_ids[bs]
            end_count = 0
            last_eoa = 0
            temp_id = None
            for i, temp_id in enumerate(ids):
                if temp_id == END_OF_ANSWER_ID:
                    if end_count % 2 == 0:
                        targets[bs, last_eoa: i + 6] = IGNORE_TOKEN_ID
                    else:
                        last_eoa = i + 1
                    end_count += 1
                elif temp_id == EOS_ID:
                    targets[bs, i + 1:] = IGNORE_TOKEN_ID
                    break
            if temp_id != EOS_ID and end_count % 2 == 0:
                targets[bs, last_eoa + 1:] = IGNORE_TOKEN_ID
        return targets

    def batch_decode(self, *args, **kwargs):
        return self.tokenizer.batch_decode(*args, **kwargs)

    def decode(self, ids, **kwargs):
        ids = np.asarray(ids)
        if ids.ndim > 1:
            ids = ids[0]
        return self.tokenizer.decode(list(ids), **kwargs)
