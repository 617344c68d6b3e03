"""Auto classes: name -> config/model/processor resolution.

Rebuild of the reference auto registry (paddlemix/auto/modeling.py:112-301
AutoModelMIX, auto/processing.py AutoProcessorMIX, auto/configuration.py):
reads config.json's model_type/architectures and dispatches to the right
class. Lazy imports keep startup light."""

from __future__ import annotations

import importlib
import json
from typing import Optional

from .utils.hub import resolve_file

# model_type -> (module, config class, model class)
_MODEL_REGISTRY = {
    "clip": ("paddlemix_tpu.models.clip", "CLIPConfig", "CLIPModel"),
    "clip_text_model": ("paddlemix_tpu.models.clip", "CLIPTextConfig", "CLIPTextModel"),
    "llama": ("paddlemix_tpu.models.llama", "LlamaConfig", "LlamaForCausalLM"),
    "qwen2": ("paddlemix_tpu.models.llama", "LlamaConfig", "LlamaForCausalLM"),
    "opt": ("paddlemix_tpu.models.opt", "OPTConfig", "OPTForCausalLM"),
    "llava": ("paddlemix_tpu.models.llava", "LlavaConfig", "LlavaForConditionalGeneration"),
    "blip-2": ("paddlemix_tpu.models.blip2", "Blip2Config", "Blip2ForConditionalGeneration"),
    "blip2": ("paddlemix_tpu.models.blip2", "Blip2Config", "Blip2ForConditionalGeneration"),
    "qwen2_vl": ("paddlemix_tpu.models.qwen2_vl", "Qwen2VLConfig",
                 "Qwen2VLForConditionalGeneration"),
    "unet_2d_condition": ("paddlemix_tpu.diffusers.models", "UNet2DConditionConfig",
                          "UNet2DConditionModel"),
    "autoencoder_kl": ("paddlemix_tpu.diffusers.models", "AutoencoderKLConfig",
                       "AutoencoderKL"),
    "dit": ("paddlemix_tpu.diffusers.models", "DiTConfig", "DiTModel"),
    "sd3_transformer": ("paddlemix_tpu.diffusers.models", "SD3TransformerConfig",
                        "SD3Transformer2DModel"),
    "t5": ("paddlemix_tpu.models.t5", "T5Config", "T5EncoderModel"),
    "internvl_chat": ("paddlemix_tpu.models.internvl2", "InternVLChatConfig",
                      "InternVLChatModel"),
    "eva02": ("paddlemix_tpu.models.eva02", "EVA02Config", "EVA02Model"),
    "whisper": ("paddlemix_tpu.models.whisper", "WhisperConfig",
                "WhisperForConditionalGeneration"),
    "sam": ("paddlemix_tpu.models.sam", "SamConfig", "SamModel"),
    "qwen_vl": ("paddlemix_tpu.models.qwen_vl", "QwenVLConfig",
                "QwenVLForConditionalGeneration"),
    "minigpt4": ("paddlemix_tpu.models.minigpt4", "MiniGPT4Config",
                 "MiniGPT4ForConditionalGeneration"),
    "imagebind": ("paddlemix_tpu.models.imagebind", "ImageBindConfig", "ImageBindModel"),
    "groundingdino": ("paddlemix_tpu.models.groundingdino", "GroundingDinoConfig",
                      "GroundingDinoModel"),
    "visualglm": ("paddlemix_tpu.models.visualglm", "VisualGLMConfig",
                  "VisualGLMForConditionalGeneration"),
    "chatglm": ("paddlemix_tpu.models.visualglm", "ChatGLMConfig", "ChatGLMForCausalLM"),
    "cogvlm": ("paddlemix_tpu.models.cogvlm", "CogVLMConfig", "CogVLMForCausalLM"),
    "navit": ("paddlemix_tpu.models.navit", "NaViTConfig", "NaViTModel"),
    "hunyuan_dit": ("paddlemix_tpu.diffusers.models", "HunyuanDiTConfig",
                    "HunyuanDiTModel"),
    "uvit_t2i": ("paddlemix_tpu.diffusers.models.uvit_t2i", "UViTT2IConfig",
                 "UViTT2IModel"),
    "internlm_xcomposer2": ("paddlemix_tpu.models.internlm_xcomposer2", "IXC2Config",
                            "IXC2ForCausalLM"),
}

_PROCESSOR_REGISTRY = {
    "clip": ("paddlemix_tpu.processors.clip_processing", "CLIPProcessor"),
    "qwen2_vl": ("paddlemix_tpu.processors.qwen2_vl_processing", "Qwen2VLProcessor"),
    "internvl_chat": ("paddlemix_tpu.processors.internvl_processing",
                      "InternVLImageProcessor"),
    "sam": ("paddlemix_tpu.processors.sam_processing", "SamProcessor"),
    "groundingdino": ("paddlemix_tpu.processors.groundingdino_processing",
                      "GroundingDinoProcessor"),
    "blip-2": ("paddlemix_tpu.processors.blip_processing", "Blip2Processor"),
    "minigpt4": ("paddlemix_tpu.processors.minigpt4_processing",
                 "MiniGPT4Processor"),
    "visualglm": ("paddlemix_tpu.processors.visualglm_processing",
                  "VisualGLMProcessor"),
    "imagebind": ("paddlemix_tpu.processors.imagebind_processing",
                  "ImageBindProcessor"),
    "qwen_vl": ("paddlemix_tpu.processors.qwen_vl_processing",
                "QwenVLProcessor"),
    "internlm_xcomposer2": ("paddlemix_tpu.processors.internlm_xcomposer2_processing",
                            "InternLMXComposer2Processor"),
}


def _read_model_type(path: str, subfolder=None) -> str:
    cfg_path = resolve_file(path, "config.json", subfolder=subfolder)
    with open(cfg_path) as f:
        data = json.load(f)
    mt = data.get("model_type", "")
    if mt in _MODEL_REGISTRY:
        return mt
    for arch in data.get("architectures", []) or []:
        for key, (_, _, cls) in _MODEL_REGISTRY.items():
            if cls.lower().startswith(arch.lower()[:8]):
                return key
    raise ValueError(f"unrecognized model_type {mt!r} at {path!r}; "
                     f"known: {sorted(_MODEL_REGISTRY)}")


def _load(entry, idx):
    mod = importlib.import_module(entry[0])
    return getattr(mod, entry[idx])


class AutoConfig:
    @classmethod
    def from_pretrained(cls, path: str, subfolder=None, **kwargs):
        mt = _read_model_type(path, subfolder)
        return _load(_MODEL_REGISTRY[mt], 1).from_pretrained(path, subfolder=subfolder, **kwargs)


class AutoModel:
    @classmethod
    def from_pretrained(cls, path: str, subfolder=None, **kwargs):
        mt = _read_model_type(path, subfolder)
        return _load(_MODEL_REGISTRY[mt], 2).from_pretrained(path, subfolder=subfolder, **kwargs)


class AutoProcessor:
    @classmethod
    def from_pretrained(cls, path: str, **kwargs):
        mt = _read_model_type(path)
        key = mt if mt in _PROCESSOR_REGISTRY else {"blip-2": "clip", "llava": "clip"}.get(mt, "clip")
        return _load(_PROCESSOR_REGISTRY[key], 1).from_pretrained(path, **kwargs)


# reference-compatible aliases (AutoModelMIX etc., paddlemix/auto/__init__)
AutoConfigMIX = AutoConfig
AutoModelMIX = AutoModel
AutoProcessorMIX = AutoProcessor
