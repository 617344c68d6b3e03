from .modeling import GroundingDinoConfig, GroundingDinoModel
from .swin import SwinBackbone, SwinConfig
