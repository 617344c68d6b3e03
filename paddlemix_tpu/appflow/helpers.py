"""VLM bundles for appflow tasks (reference appflow/image2text_generation.py
wraps blip2/miniGPT4/qwen_vl; here one bundle per family over AutoModel)."""

from __future__ import annotations

from typing import Optional

import numpy as np


class VLMBundle:
    """model + image processor + tokenizer + prompt template -> answer()."""

    def __init__(self, model, image_processor, tokenizer,
                 prompt_template: str = "USER: <image>\n{prompt} ASSISTANT:",
                 max_new_tokens: int = 64):
        self.model = model
        self.image_processor = image_processor
        self.tokenizer = tokenizer
        self.prompt_template = prompt_template
        self.max_new_tokens = max_new_tokens

    def answer(self, image=None, prompt: str = "") -> str:
        import jax.numpy as jnp

        cfg = self.model.config
        text = self.prompt_template.format(prompt=prompt)
        n_img = getattr(cfg, "num_image_tokens", None) or getattr(cfg, "num_query_tokens", 0)
        pre, _, post = text.partition("<image>")
        ids = (self.tokenizer.encode(pre)
               + [cfg.image_token_index] * (n_img if "<image>" in text else 0)
               + self.tokenizer.encode(post))
        input_ids = np.asarray([ids], np.int32)
        pixel_values = None
        if image is not None:
            pixel_values = jnp.asarray(self.image_processor([image])["pixel_values"],
                                       self.model.dtype)
        out = self.model.generate(input_ids, pixel_values,
                                  max_new_tokens=self.max_new_tokens)
        tokens = np.asarray(out[0])
        eos = getattr(cfg, "text", cfg)
        eos_id = getattr(eos, "eos_token_id", None)
        if eos_id is not None and (tokens == eos_id).any():
            tokens = tokens[: int(np.argmax(tokens == eos_id))]
        return self.tokenizer.decode(tokens)


def load_vlm(path: str, **kwargs) -> VLMBundle:
    from ..auto import AutoModel
    from ..processors.clip_processing import CLIPImageProcessor
    from ..utils.tokenizer import load_tokenizer

    model = AutoModel.from_pretrained(path)
    try:
        image_processor = CLIPImageProcessor.from_pretrained(path)
    except FileNotFoundError:
        size = getattr(model.config.vision, "image_size", 224)
        image_processor = CLIPImageProcessor(size=size, crop_size=size)
    tokenizer = load_tokenizer(path)
    return VLMBundle(model, image_processor, tokenizer, **kwargs)
