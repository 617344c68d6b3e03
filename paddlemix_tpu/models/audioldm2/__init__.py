"""AudioLDM2 stack (reference paddlemix/models/audioldm2/ and
ppdiffusers/pipelines/audioldm2/): CLAP text tower, dual-encoder projection
with learned SOS/EOS, GPT-2 continuous prompt generation (models/gpt2), the
dual-context UNet, and the HiFi-GAN vocoder shared with AudioLDM1."""

from .clap import ClapTextConfig, ClapTextModelWithProjection
from .projection import AudioLDM2ProjectionModel, AudioLDM2ProjectionConfig
from .unet import AudioLDM2UNet, AudioLDM2UNetConfig
