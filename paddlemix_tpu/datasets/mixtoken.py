"""MixToken sample packing: the reference's 5.6x SFT-throughput trick.

Rebuild of MIXTokenMapDataset (reference paddlemix/datasets/
mixtoken_dataset.py:21-130, throughput claim docs/CHANGELOG.md:11): pack
multiple tokenized samples into one max_length row. TPU twist: each packed row
also carries segment ids and intra-sample positions so the Pallas flash
attention masks cross-sample attention exactly (the reference relies on causal
attention + loss masking only)."""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence

import numpy as np

from .dataset import MapDataset

IGNORE_INDEX = -100


def pack_samples(
    samples: Iterable[Dict[str, Sequence[int]]],
    max_length: int,
    pad_token_id: int = 0,
    drop_last_incomplete: bool = False,
) -> List[Dict[str, np.ndarray]]:
    """samples: dicts with 1-D ``input_ids`` (+optional ``labels``).

    Returns rows with input_ids, labels, segment_ids (1-based; 0 = padding),
    positions (restart at 0 per sample; -1 at padding), attention_mask."""
    rows: List[Dict[str, np.ndarray]] = []
    cur_ids: List[int] = []
    cur_labels: List[int] = []
    cur_seg: List[int] = []
    cur_pos: List[int] = []
    seg = 1

    def flush():
        nonlocal cur_ids, cur_labels, cur_seg, cur_pos, seg
        if not cur_ids:
            return
        pad = max_length - len(cur_ids)
        rows.append({
            "input_ids": np.asarray(cur_ids + [pad_token_id] * pad, np.int32),
            "labels": np.asarray(cur_labels + [IGNORE_INDEX] * pad, np.int32),
            "segment_ids": np.asarray(cur_seg + [0] * pad, np.int32),
            "positions": np.asarray(cur_pos + [-1] * pad, np.int32),
            "attention_mask": np.asarray([1] * len(cur_ids) + [0] * pad, np.int32),
        })
        cur_ids, cur_labels, cur_seg, cur_pos = [], [], [], []
        seg = 1

    for sample in samples:
        ids = list(sample["input_ids"])[:max_length]
        labels = list(sample.get("labels", ids))[:max_length]
        if len(cur_ids) + len(ids) > max_length:
            flush()
        cur_ids.extend(ids)
        cur_labels.extend(labels)
        cur_seg.extend([seg] * len(ids))
        cur_pos.extend(range(len(ids)))
        seg += 1
    if not drop_last_incomplete:
        flush()
    return rows


class MixTokenMapDataset(MapDataset):
    def __init__(self, dataset: Iterable, max_length: int, pad_token_id: int = 0):
        super().__init__(pack_samples(dataset, max_length, pad_token_id))
