from .collator import DataLoader, pad_collate, stack_collate
from .dataset import (
    DATASETS,
    ConcatDataset,
    MapDataset,
    WeightedConcatDataset,
    load_dataset,
)
from .mixtoken import IGNORE_INDEX, MixTokenMapDataset, pack_samples
from .recipes import apply_chat_template, chatml, coco_caption, coco_clip, coco_vqa
