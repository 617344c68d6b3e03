from .base import BaseImageProcessor, ProcessorMixin
from .clip_processing import CLIPImageProcessor, CLIPProcessor
from .internvl_processing import InternVLImageProcessor, dynamic_preprocess
from .qwen2_vl_processing import Qwen2VLImageProcessor, Qwen2VLProcessor, smart_resize
