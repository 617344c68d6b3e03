from .modeling import (
    NaViTConfig,
    NaViTModel,
    NaViTModule,
    group_images_by_max_seq_len,
    image_to_patches,
    pack_images,
)
