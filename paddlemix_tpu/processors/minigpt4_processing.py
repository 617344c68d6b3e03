"""MiniGPT4 processing.

Rebuild of the reference's MiniGPT4 processors (paddlemix/processors/
minigpt4_processing.py:42-296 + minigpt4_image_processing.py): a
conversation prompt carrying an ``<ImageHere>`` tag is split around the tag
into first/second token runs (the model splices visual query tokens
between them), and train targets are tokenized with pad positions masked
to -100."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Union

import numpy as np

from .base import ProcessorMixin
from .blip_processing import BlipImageProcessor


DEFAULT_MINIGPT4_PROMPT = (
    "Give the following image: <Img>ImageContent</Img>. You will be able to "
    "see the image once I provide it to you. Please answer my questions."
    "###Human: <Img><ImageHere></Img> <TextHere>###Assistant: "
)


class MiniGPT4Processor(ProcessorMixin):
    image_processor_class = BlipImageProcessor
    image_tag = "<ImageHere>"
    text_tag = "<TextHere>"

    def __init__(self, image_processor=None, tokenizer=None,
                 default_prompt: str = DEFAULT_MINIGPT4_PROMPT,
                 end_sym: str = "\n", max_target_len: int = 160, **kw):
        super().__init__(
            image_processor=image_processor or BlipImageProcessor(),
            tokenizer=tokenizer, **kw)
        self.default_prompt = default_prompt
        self.end_sym = end_sym
        self.max_target_len = max_target_len

    def process_images(self, images, mode: str = "test") -> Dict[str, np.ndarray]:
        if images is None:
            raise ValueError("You have to input correct images.")
        if not isinstance(images, (list, tuple)):
            images = [images]
        return self.image_processor(images, mode=mode)

    def process_texts(self, texts, prompts=None) -> Dict[str, np.ndarray]:
        """Assemble prompt+text, split at the image tag, tokenize both runs
        (reference minigpt4_processing.py:147-213). The first run keeps the
        BOS special token; the second does not."""
        prompts = prompts if prompts is not None else [self.default_prompt]
        if isinstance(texts, str):
            texts = [texts] * (len(prompts) if isinstance(prompts, list) else 1)
        if isinstance(prompts, str):
            prompts = [prompts] * len(texts)
        if len(prompts) != len(texts):
            raise ValueError(f"prompts/texts length mismatch: "
                             f"{len(prompts)} != {len(texts)}")
        assembled = []
        for text, prompt in zip(texts, prompts):
            if self.image_tag in text:
                assembled.append(text)
                continue
            if self.image_tag not in prompt:
                raise ValueError(f"prompt must contain {self.image_tag}")
            if self.text_tag not in prompt:
                raise ValueError(f"prompt must contain {self.text_tag}")
            assembled.append(prompt.replace(self.text_tag, text))
        firsts, seconds = zip(*[a.split(self.image_tag) for a in assembled])
        first = self._tokenize(firsts, add_special_tokens=True)
        second = self._tokenize(seconds, add_special_tokens=False)
        return {"first_input_ids": first["input_ids"],
                "first_attention_mask": first["attention_mask"],
                "second_input_ids": second["input_ids"],
                "second_attention_mask": second["attention_mask"]}

    def process_target_texts(self, target_texts, end_sym: Optional[str] = None,
                             max_target_len: Optional[int] = None):
        """Train targets with pad masked to -100
        (reference minigpt4_processing.py:122-145)."""
        end_sym = end_sym if end_sym is not None else self.end_sym
        limit = max_target_len or self.max_target_len
        enc = self._tokenize([t + end_sym for t in target_texts],
                             add_special_tokens=False, max_length=limit)
        ids = enc["input_ids"]
        pad = getattr(self.tokenizer, "pad_token_id", 0)
        masked = np.where(ids != pad, ids, np.full_like(ids, -100))
        return {"labels": ids, "masked_labels": masked,
                "label_attention_mask": enc["attention_mask"]}

    def _tokenize(self, texts, add_special_tokens: bool,
                  max_length: Optional[int] = None) -> Dict[str, np.ndarray]:
        rows = []
        for t in texts:
            ids = self.tokenizer.encode(t) if add_special_tokens else \
                self.tokenizer.encode(t, add_special_tokens=False)
            if max_length:
                ids = ids[:max_length]
            rows.append(ids)
        width = max(len(r) for r in rows)
        pad = getattr(self.tokenizer, "pad_token_id", 0) or 0
        out_ids = np.full((len(rows), width), pad, np.int64)
        mask = np.zeros((len(rows), width), np.int64)
        for i, r in enumerate(rows):
            out_ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return {"input_ids": out_ids, "attention_mask": mask}

    def __call__(self, images=None, text: Optional[str] = None,
                 prompt: Optional[str] = None, mode: str = "test", **kwargs):
        prompt = prompt if prompt is not None else self.default_prompt
        if images is None and text is None:
            raise ValueError("specify either images or text")
        if text is None:
            return self.process_images(images, mode=mode)
        if images is None:
            return self.process_texts([text], [prompt])
        if not isinstance(images, (list, tuple)):
            images = [images]
        enc = self.image_processor(images, mode=mode)
        enc.update(self.process_texts([text] * len(images),
                                      [prompt] * len(images)))
        return enc

    def batch_decode(self, sequences, **kwargs):
        return [self.tokenizer.decode(np.asarray(s).tolist(), **kwargs)
                for s in sequences]

    def decode(self, ids, **kwargs):
        return self.tokenizer.decode(np.asarray(ids).tolist(), **kwargs)
