from .modeling import T5Config, T5EncoderModel, T5EncoderModule
