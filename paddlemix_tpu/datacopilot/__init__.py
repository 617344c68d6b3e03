from .dataset import MMDataset, ParallelMode
from . import nn, ops
from .nn import FastTextLIDModel, PPInsCapTagger, filter_by_language, language_of
from .ops import (
    convert_mix_to_mm,
    convert_mm_to_mix,
    head,
    info,
    is_valid_mm,
    token_length_stats,
    value_counts,
)
