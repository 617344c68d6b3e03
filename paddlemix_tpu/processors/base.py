"""Processor base classes.

Mirrors the public shape of the reference's BaseProcessingMixin /
BaseImageProcessor (paddlemix/processors/processing_utils.py,
image_processing_utils.py): config round-trip via preprocessor_config.json,
`from_pretrained`, callable preprocessing."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

from ..core.config import BaseConfig


@dataclasses.dataclass
class BaseImageProcessor(BaseConfig):
    config_name = "preprocessor_config.json"

    def __call__(self, images, **kwargs) -> Dict[str, Any]:
        raise NotImplementedError


class ProcessorMixin:
    """Bundles an image processor and a tokenizer (reference Qwen2VLProcessor
    et al., qwen2_vl_processing.py:102)."""

    image_processor_class = None  # dataclass type used by from_pretrained

    def __init__(self, image_processor=None, tokenizer=None, **components):
        self.image_processor = image_processor
        self.tokenizer = tokenizer
        for k, v in components.items():
            setattr(self, k, v)

    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        """Generic bundle load: the image processor from
        preprocessor_config.json (defaults if absent) + any tokenizer files
        at ``path`` (reference ProcessorMixin.from_pretrained,
        processing_utils.py)."""
        from ..utils.tokenizer import load_tokenizer

        image_processor = None
        if cls.image_processor_class is not None:
            try:
                image_processor = cls.image_processor_class.from_pretrained(path)
            except FileNotFoundError:
                image_processor = cls.image_processor_class()
        try:
            tokenizer = load_tokenizer(path)
        except FileNotFoundError:
            tokenizer = None
        return cls(image_processor=image_processor, tokenizer=tokenizer,
                   **kwargs)

    def save_pretrained(self, path: str):
        os.makedirs(path, exist_ok=True)
        if self.image_processor is not None:
            self.image_processor.save_pretrained(path)
