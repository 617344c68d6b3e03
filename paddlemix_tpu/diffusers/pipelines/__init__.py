from .pipeline_utils import (
    PIPELINE_REGISTRY,
    DiffusionPipeline,
    register_pipeline,
)
from .stable_diffusion import StableDiffusionPipeline, StableDiffusionXLPipeline
