from .modeling import InternVLChatConfig, InternVLChatModel, pixel_shuffle
