"""Batch collators (reference paddlemix/datasets/collator.py:19-150 — per-model
CLIP/EVA02/MiniGPT4/QwenVL/Visualglm/LLaVA/InternLMXComposer2/InternVL2
collators collapse into a few generic ones here)."""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


def stack_collate(batch: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    """Stack same-shaped fields (CLIP/EVA02-style)."""
    out: Dict[str, np.ndarray] = {}
    for k in batch[0]:
        vals = [np.asarray(s[k]) for s in batch]
        out[k] = np.stack(vals)
    return out


def pad_collate(batch: Sequence[Dict[str, Any]], pad_token_id: int = 0,
                ignore_index: int = -100,
                pad_to_multiple_of: Optional[int] = 64) -> Dict[str, np.ndarray]:
    """Right-pad variable-length token fields (LLaVA/QwenVL-style); pads
    sequences to a bucket multiple so XLA sees few distinct shapes."""
    out: Dict[str, np.ndarray] = {}
    token_keys = [k for k in batch[0] if k in
                  ("input_ids", "labels", "attention_mask", "positions", "segment_ids")]
    max_len = max(len(np.asarray(s[token_keys[0]]).reshape(-1)) for s in batch)
    if pad_to_multiple_of:
        max_len = -(-max_len // pad_to_multiple_of) * pad_to_multiple_of
    fills = {"input_ids": pad_token_id, "labels": ignore_index,
             "attention_mask": 0, "positions": -1, "segment_ids": 0}
    for k in batch[0]:
        if k in token_keys:
            rows = []
            for s in batch:
                v = np.asarray(s[k]).reshape(-1)
                rows.append(np.pad(v, (0, max_len - len(v)), constant_values=fills[k]))
            out[k] = np.stack(rows).astype(np.int32)
        else:
            out[k] = np.stack([np.asarray(s[k]) for s in batch])
    if "attention_mask" not in out and "input_ids" in out:
        out["attention_mask"] = (out["input_ids"] != pad_token_id).astype(np.int32)
    return out


class DataLoader:
    """Shuffling batcher over a MapDataset with an async worker pool.

    ``num_workers > 0`` runs fetch+collate for upcoming batches in a thread
    pool with a ``prefetch_batches``-deep ordered queue, so host
    preprocessing overlaps device compute (the reference overlaps via
    paddle DataLoader worker processes and tracks the residue as
    reader-cost telemetry, blip2_trainer.py:125-155; here threads suffice —
    PIL/numpy/the native preprocess extension release the GIL for the hot
    loops, and batches land in-order with no IPC serialization)."""

    def __init__(self, dataset, batch_size: int, collate_fn=stack_collate,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = True,
                 num_workers: int = 0, prefetch_batches: int = 4,
                 sampler=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch_batches = max(prefetch_batches, num_workers or 1)
        self.sampler = sampler  # e.g. datasets.LengthGroupedSampler
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _chunks(self):
        if self.sampler is not None:
            idx = np.fromiter(iter(self.sampler), dtype=np.int64)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                np.random.RandomState(self.seed + self._epoch).shuffle(idx)
                self._epoch += 1
        for i in range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0),
                       self.batch_size):
            chunk = idx[i: i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            yield chunk

    def _fetch(self, chunk):
        return self.collate_fn([self.dataset[j] for j in chunk])

    def __iter__(self):
        if not self.num_workers:
            for chunk in self._chunks():
                yield self._fetch(chunk)
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(self.num_workers) as pool:
            futs = collections.deque()
            chunks = self._chunks()
            for chunk in chunks:
                futs.append(pool.submit(self._fetch, chunk))
                if len(futs) >= self.prefetch_batches:
                    break
            while futs:
                batch = futs.popleft().result()
                nxt = next(chunks, None)
                if nxt is not None:
                    futs.append(pool.submit(self._fetch, nxt))
                yield batch
