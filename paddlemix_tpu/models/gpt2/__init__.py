from .modeling import GPT2Config, GPT2Model
