"""ppdiffusers-equivalent generation suite, TPU-native.

Maps to the reference's ppdiffusers/ppdiffusers (models, schedulers,
pipelines, image processor); see per-module docstrings for file:line parity
citations."""

from .image_processor import VaeImageProcessor
from .models import (
    AutoencoderKL,
    AutoencoderKLConfig,
    ControlNetConfig,
    ControlNetModel,
    DiTConfig,
    DiTModel,
    SD3Transformer2DModel,
    SD3TransformerConfig,
    UNet2DConditionConfig,
    UNet2DConditionModel,
    UNetMotionConfig,
    UNetMotionModel,
    UNetSpatioTemporalConditionConfig,
    UNetSpatioTemporalConditionModel,
    AutoencoderKLTemporalDecoder,
    AutoencoderKLTemporalDecoderConfig,
    T2IAdapter,
    T2IAdapterConfig,
)
from .pipelines import (
    StableDiffusionDepth2ImgPipeline,
    StableDiffusionLDM3DPipeline,
    StableDiffusionModelEditingPipeline,
    StableDiffusionPanoramaPipeline,
    StableDiffusionParadigmsPipeline,
    StableDiffusionSAGPipeline,
    StableUnCLIPImageNormalizer,
    StableUnCLIPImg2ImgPipeline,
    AudioLDMPipeline,
    DiffusionPipeline,
    StableDiffusionControlNetPipeline,
    DiTPipeline,
    StableDiffusion3Pipeline,
    StableDiffusionImg2ImgPipeline,
    StableDiffusionInpaintPipeline,
    StableDiffusionPipeline,
    StableDiffusionXLPipeline,
    TextToVideoPipeline,
    AnimateDiffPipeline,
    StableVideoDiffusionPipeline,
    UnCLIPPipeline,
    StableDiffusionAdapterPipeline,
    PaintByExamplePipeline,
    RePaintPipeline,
    ConsistencyModelPipeline,
    DDPMPipeline,
    DDIMPipeline,
    SemanticStableDiffusionPipeline,
    SafetyConfig,
    StableDiffusionPipelineSafe,
    AltDiffusionPipeline,
    BlipDiffusionPipeline,
    LatentConsistencyModelPipeline,
)
from .schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    FlowMatchEulerDiscreteScheduler,
    LCMScheduler,
)
from .single_file import load_pipeline_from_single_file
from .auto_pipeline import (
    AutoPipelineForImage2Image,
    AutoPipelineForInpainting,
    AutoPipelineForText2Image,
)
