"""Alt-Diffusion (reference ppdiffusers/pipelines/alt_diffusion): Stable
Diffusion with the multilingual XLM-R text encoder
(RobertaSeriesModelWithTransformation) — the projection head emits the UNet
context, so the SD loops are reused unchanged."""

from __future__ import annotations

from .pipeline_utils import register_pipeline
from .stable_diffusion import StableDiffusionPipeline
from .stable_diffusion_img2img import StableDiffusionImg2ImgPipeline


@register_pipeline
class AltDiffusionPipeline(StableDiffusionPipeline):
    """text_encoder: models.bert.RobertaSeriesModelWithTransformation;
    tokenizer: any XLM-R tokenizer callable returning {"input_ids"}."""


@register_pipeline
class AltDiffusionImg2ImgPipeline(StableDiffusionImg2ImgPipeline):
    pass
