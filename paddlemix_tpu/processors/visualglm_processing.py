"""VisualGLM processing.

Rebuild of the reference's VisualGLM processors (paddlemix/processors/
visualglm_processing.py:40-226 + visualglm_image_processing.py): the ChatGLM
chat template 问：…\\n答： with history, ``<img></img>`` image placeholder
expanded to ``num_query_tokens`` unk ids, and the pre-image length the
prefix-LM attention needs."""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .base import ProcessorMixin
from .blip_processing import BlipImageProcessor


class VisualGLMProcessor(ProcessorMixin):
    image_processor_class = BlipImageProcessor
    image_tag = "<img></img>"

    def __init__(self, image_processor=None, tokenizer=None,
                 num_query_tokens: int = 32,
                 default_prompt: str = "<img></img>", **kw):
        super().__init__(
            image_processor=image_processor or BlipImageProcessor(),
            tokenizer=tokenizer, **kw)
        self.num_query_tokens = num_query_tokens
        self.default_prompt = default_prompt

    def build_prompt(self, query: str,
                     history: Optional[List[Tuple[str, str]]] = None,
                     with_image: bool = True) -> str:
        prompt = self.default_prompt if with_image else ""
        for old_query, response in history or []:
            prompt += "问：{}\n答：{}\n".format(old_query, response)
        prompt += "问：{}\n答：".format(query)
        return prompt

    def build_inputs_with_image(self, image, query: str,
                                history=None) -> Dict[str, np.ndarray]:
        """reference visualglm_processing.py:120-157: split the prompt at the
        image tag, splice unk placeholders, append the gMASK/sop specials via
        the tokenizer's special-token builder."""
        prompt = self.build_prompt(query, history, with_image=image is not None)
        if image is None:
            enc = self._encode(prompt)
            return {"input_ids": np.asarray([enc], np.int64),
                    "pre_image_length": 0}
        start = prompt.rfind(self.image_tag)
        end = start + len(self.image_tag)
        first = self._encode(prompt[:start], special=False)
        unk = getattr(self.tokenizer, "unk_token_id", None)
        if unk is None:
            unk = self.tokenizer.token_to_id("<unk>") or 0
        image_ids = [unk] * self.num_query_tokens
        second = self._encode(prompt[end:], special=False)
        ids = first + image_ids + second
        if hasattr(self.tokenizer, "build_inputs_with_special_tokens"):
            ids = self.tokenizer.build_inputs_with_special_tokens(ids)
        enc = self.image_processor([image])
        return {"input_ids": np.asarray([ids], np.int64),
                "pre_image_length": len(first),
                "pixel_values": enc["pixel_values"]}

    def _encode(self, text: str, special: bool = True) -> List[int]:
        try:
            return self.tokenizer.encode(text, add_special_tokens=special)
        except TypeError:
            return self.tokenizer.encode(text)

    def __call__(self, image, query: str, history=None, **kwargs):
        if image is None:
            raise ValueError("Image should not be None.")
        if query is None:
            raise ValueError("Query should not be None.")
        if history is not None and not isinstance(history, list):
            raise TypeError("history must be a list of (query, response)")
        return self.build_inputs_with_image(image, query, history=history)

    def process_response(self, response: str) -> str:
        """reference visualglm_processing.py:197-210: ASCII punctuation is
        converted to the full-width form only when adjacent to a CJK char."""
        import re

        response = response.strip().replace("[[训练时间]]", "2023年")
        for en, cn in [(",", "，"), ("!", "！"), (":", "："), (";", "；"),
                       (r"\?", "？")]:
            response = re.sub(r"([一-鿿])%s" % en, r"\1%s" % cn,
                              response)
            response = re.sub(r"%s([一-鿿])" % en, r"%s\1" % cn,
                              response)
        return response

    def batch_decode(self, sequences, **kwargs):
        return [self.tokenizer.decode(np.asarray(s).tolist(), **kwargs)
                for s in sequences]

    def decode(self, ids, **kwargs):
        return self.tokenizer.decode(np.asarray(ids).tolist(), **kwargs)
