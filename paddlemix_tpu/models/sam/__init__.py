from .modeling import SamConfig, SamImageEncoder, SamMaskDecoder, SamModel, SamPromptEncoder
