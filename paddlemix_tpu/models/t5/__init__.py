from .modeling import T5Config, T5EncoderModel, T5EncoderModule
from .modeling import T5ForConditionalGeneration, T5ForConditionalGenerationModule
