from .modeling import MODALITIES, ImageBindConfig, ImageBindModel
