from .autoencoder_kl import AutoencoderKL, AutoencoderKLConfig, DiagonalGaussian
from .embeddings import (
    PatchEmbed2D,
    TimestepEmbedding,
    Timesteps,
    get_2d_sincos_pos_embed,
    get_timestep_embedding,
)
from .unet_2d_condition import UNet2DConditionConfig, UNet2DConditionModel
from .dit import DiTConfig, DiTModel
from .transformer_sd3 import SD3Transformer2DModel, SD3TransformerConfig
from .controlnet import ControlNetConfig, ControlNetModel
from .unet_motion import UNetMotionConfig, UNetMotionModel
from .prior_transformer import PriorTransformer, PriorTransformerConfig
from .vq_model import VQModel, VQModelConfig
from .wuerstchen import (
    PaellaVQConfig,
    PaellaVQModel,
    WuerstchenDiffNeXt,
    WuerstchenDiffNeXtConfig,
    WuerstchenPrior,
    WuerstchenPriorConfig,
)
from .stable_cascade import StableCascadeUNet, StableCascadeUNetConfig
from .unet_1d import UNet1DConfig, UNet1DModel
from .pixart import PixArtConfig, PixArtTransformer2DModel
from .kandinsky3 import Kandinsky3UNet, Kandinsky3UNetConfig
from .unet_spatio_temporal import (
    UNetSpatioTemporalConditionConfig,
    UNetSpatioTemporalConditionModel,
)
from .autoencoder_kl_temporal import (
    AutoencoderKLTemporalDecoder,
    AutoencoderKLTemporalDecoderConfig,
)
from .autoencoder_variants import (
    AsymmetricAutoencoderKL,
    AsymmetricAutoencoderKLConfig,
    AutoencoderTiny,
    AutoencoderTinyConfig,
    ConsistencyDecoderVAE,
    ConsistencyDecoderVAEConfig,
)
from .adapter import T2IAdapter, T2IAdapterConfig
from .lvdm import (
    LVDMAutoencoderConfig,
    LVDMAutoencoderKL,
    LVDMUNet3DConfig,
    LVDMUNet3DModel,
)
from .hunyuan_dit import (
    HunyuanDiTConfig,
    HunyuanDiTModel,
    HunyuanDiTModule,
    get_2d_rotary_pos_embed,
)
from .magvit2 import (
    FSQ,
    LFQ,
    FrameDiscriminator,
    VideoTokenizer,
    hinge_d_loss,
    hinge_g_loss,
)
from .stdit import STDiT2Config, STDiT2Model
