"""AutoPipeline (reference ppdiffusers/auto_pipeline.py): resolve the right
task pipeline class from a checkpoint's model_index.json `_class_name`, with
task-remapping tables so a text2img checkpoint loads as img2img/inpaint."""

from __future__ import annotations

from .pipelines.pipeline_utils import PIPELINE_REGISTRY, DiffusionPipeline

TEXT2IMAGE_MAP = {
    "StableDiffusionPipeline": "StableDiffusionPipeline",
    "StableDiffusionXLPipeline": "StableDiffusionXLPipeline",
    "StableDiffusion3Pipeline": "StableDiffusion3Pipeline",
    "StableDiffusionControlNetPipeline": "StableDiffusionControlNetPipeline",
    "PixArtAlphaPipeline": "PixArtAlphaPipeline",
    "KandinskyV22Pipeline": "KandinskyV22Pipeline",
    "WuerstchenCombinedPipeline": "WuerstchenCombinedPipeline",
    "StableCascadeCombinedPipeline": "StableCascadeCombinedPipeline",
}

IMAGE2IMAGE_MAP = {
    "StableDiffusionPipeline": "StableDiffusionImg2ImgPipeline",
    "StableDiffusionImg2ImgPipeline": "StableDiffusionImg2ImgPipeline",
}

INPAINT_MAP = {
    "StableDiffusionPipeline": "StableDiffusionInpaintPipeline",
    "StableDiffusionInpaintPipeline": "StableDiffusionInpaintPipeline",
}


def _load_mapped(path, mapping, **kwargs):
    import json
    import os

    from ..utils.hub import resolve_file

    idx = resolve_file(path, "model_index.json")
    with open(idx) as f:
        name = json.load(f).get("_class_name")
    target = mapping.get(name)
    if target is None:
        raise ValueError(f"no task mapping for pipeline class {name!r}")
    cls = PIPELINE_REGISTRY.get(target)
    base = DiffusionPipeline.from_pretrained(path, **kwargs)
    if type(base).__name__ == target:
        return base
    return cls(**{k: v for k, v in base.components.items()
                  if k in cls.__init__.__code__.co_varnames})


class AutoPipelineForText2Image:
    @classmethod
    def from_pretrained(cls, path, **kwargs):
        return _load_mapped(path, TEXT2IMAGE_MAP, **kwargs)


class AutoPipelineForImage2Image:
    @classmethod
    def from_pretrained(cls, path, **kwargs):
        return _load_mapped(path, IMAGE2IMAGE_MAP, **kwargs)


class AutoPipelineForInpainting:
    @classmethod
    def from_pretrained(cls, path, **kwargs):
        return _load_mapped(path, INPAINT_MAP, **kwargs)
