from .pipeline_utils import (
    PIPELINE_REGISTRY,
    DiffusionPipeline,
    register_pipeline,
)
from .stable_diffusion import StableDiffusionPipeline, StableDiffusionXLPipeline
from .stable_diffusion_3 import DiTPipeline, StableDiffusion3Pipeline
from .community import (
    CLIPGuidedImagesMixingPipeline,
    CLIPGuidedStableDiffusionPipeline,
    ComposableStableDiffusionPipeline,
    EDICTPipeline,
    FabricPipeline,
    StableDiffusionMegaPipeline,
    StableDiffusionReferencePipeline,
    StableDiffusionTilingPipeline,
    WildcardStableDiffusionPipeline,
    replace_prompt_with_wildcards,
    StableDiffusionHiresFixPipeline,
    StableDiffusionLongPromptPipeline,
    StableDiffusionWalkPipeline,
    get_weighted_text_embeddings,
    merge_checkpoints,
    parse_prompt_attention,
    slerp,
)
from .stable_diffusion_img2img import (
    StableDiffusionImg2ImgPipeline,
    StableDiffusionInpaintPipeline,
)
from .controlnet import StableDiffusionControlNetPipeline
from .audioldm import AudioLDMPipeline
from .text_to_video import TextToVideoPipeline
from .deepfloyd_if import IFPipeline, IFSuperResolutionPipeline
from .kandinsky import KandinskyV22Pipeline, KandinskyV22PriorPipeline
from .stable_video import ImageToVideoPipeline
from .wuerstchen import (
    WuerstchenCombinedPipeline,
    WuerstchenDecoderPipeline,
    WuerstchenPriorPipeline,
)
from .stable_cascade import (
    StableCascadeCombinedPipeline,
    StableCascadeDecoderPipeline,
    StableCascadePriorPipeline,
)
from .audioldm2 import AudioLDM2Pipeline
from .unidiffuser import (
    UniDiffuserConfig,
    UniDiffuserModel,
    UniDiffuserPipeline,
    UniDiffuserTextDecoder,
)
from .dance_diffusion import DanceDiffusionPipeline
from .musicldm import MusicLDMPipeline
from .hunyuan_dit import HunyuanDiTPipeline
from .pixart_alpha import PixArtAlphaPipeline
from .shap_e import ShapEPipeline, ShapEPrior, ShapEPriorConfig, ShapERenderer, ShapERendererConfig
from .kandinsky3 import Kandinsky3Pipeline
from .stable_video import StableVideoDiffusionPipeline
from .unconditional import (
    ConsistencyModelPipeline,
    DDIMPipeline,
    DDPMPipeline,
    LDMSuperResolutionPipeline,
    RePaintPipeline,
)
from .t2i_adapter import StableDiffusionAdapterPipeline
from .paint_by_example import PaintByExamplePipeline
from .unclip import UnCLIPPipeline, UnCLIPTextProjModel
from .semantic_guidance import (
    SafetyConfig,
    SemanticStableDiffusionPipeline,
    StableDiffusionPipelineSafe,
)
from .alt_diffusion import AltDiffusionImg2ImgPipeline, AltDiffusionPipeline
from .audio_diffusion import AudioDiffusionPipeline, Mel
from .blip_diffusion import BlipDiffusionPipeline, ContextCLIPTextModel
from .text_to_video import AnimateDiffPipeline, HotshotXLPipeline
from .latent_family import (
    KarrasVePipeline,
    LatentConsistencyModelPipeline,
    LDMPipeline,
    LDMTextToImagePipeline,
    PNDMPipeline,
    ScoreSdeVePipeline,
)
from .sd_variants import (
    CycleDiffusionPipeline,
    StableDiffusionDiffEditPipeline,
    StableDiffusionGLIGENPipeline,
    StableDiffusionImageVariationPipeline,
    StableDiffusionInstructPix2PixPipeline,
    StableDiffusionUpscalePipeline,
)
from .sd_longtail import (
    StableDiffusionDepth2ImgPipeline,
    StableDiffusionLDM3DPipeline,
    StableDiffusionModelEditingPipeline,
    StableDiffusionPanoramaPipeline,
    StableDiffusionParadigmsPipeline,
    StableDiffusionSAGPipeline,
    StableUnCLIPImageNormalizer,
    StableUnCLIPImg2ImgPipeline,
)
from .vq_diffusion import VQDiffusionPipeline, VQDiffusionTransformerModel
from .spectrogram_diffusion import (
    SpectrogramContEncoder,
    SpectrogramDiffusionPipeline,
    SpectrogramNotesEncoder,
    T5FilmDecoder,
)
from .versatile_diffusion import (
    VersatileDiffusionDualGuidedPipeline,
    VersatileDiffusionImageVariationPipeline,
    VersatileDiffusionTextToImagePipeline,
)
from .lvdm import LVDMTextToVideoPipeline, LVDMUncondPipeline
from .text_to_video import VideoToVideoPipeline
from .kandinsky import KandinskyPipeline
from .stable_diffusion import StableDiffusionKDiffusionPipeline
from .stable_diffusion_xl_variants import (
    StableDiffusionXLImg2ImgPipeline,
    StableDiffusionXLInpaintPipeline,
)
from .attend_and_excite import StableDiffusionAttendAndExcitePipeline
