from .base import BaseImageProcessor, ProcessorMixin
from .blip_processing import BlipImageProcessor, Blip2Processor, BlipTextProcessor
from .clip_processing import CLIPImageProcessor, CLIPProcessor
from .eva02_processing import DataAugmentationForEVA, RandAugment
from .llava_processing import (
    LlavaProcessor,
    process_anyres_image,
    select_best_resolution,
)
from .whisper_processing import WhisperProcessor
from .groundingdino_processing import (
    GroundingDinoImageProcessor,
    GroundingDinoProcessor,
    GroundingDinoTextProcessor,
)
from .imagebind_processing import ImageBindAudioProcessor, ImageBindProcessor
from .internvl_processing import InternVLImageProcessor, dynamic_preprocess
from .internlm_xcomposer2_processing import (
    InternLMXComposer2ImageProcessor,
    InternLMXComposer2Processor,
    InternLMXComposer2TextProcessor,
)
from .minigpt4_processing import MiniGPT4Processor
from .qwen_vl_processing import QwenVLImageProcessor, QwenVLProcessor
from .qwen2_vl_processing import Qwen2VLImageProcessor, Qwen2VLProcessor, smart_resize
from .sam_processing import SamImageProcessor, SamProcessor, SamPromptProcessor
from .visualglm_processing import VisualGLMProcessor
