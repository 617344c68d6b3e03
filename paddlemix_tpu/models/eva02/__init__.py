from .modeling import EVA02Config, EVA02Model, mim_loss, vision_rope_2d
