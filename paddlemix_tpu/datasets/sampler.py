"""Length-grouped (modality-aware) sampling.

Rebuild of the reference LLaVATrainer LengthGroupedSampler
(paddlemix/trainer/llava_trainer.py:82-134): batches draw samples of similar
token length so right-padding waste stays low, and (optionally) multimodal
and text-only samples never mix inside one batch — a text-only batch skips
the vision tower entirely, and on TPU it also avoids retracing the spliced
forward with a dummy image.

Convention (same as the reference): ``lengths[i] > 0`` marks a multimodal
sample of that token length, ``lengths[i] < 0`` a text-only sample of length
``-lengths[i]``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def _split_to_even_chunks(indices: np.ndarray, lengths: Sequence[int],
                          num_chunks: int) -> List[List[int]]:
    """Distribute one megabatch across chunks balancing total length
    (reference split_to_even_chunks)."""
    if len(indices) % num_chunks != 0:
        return [list(c) for c in np.array_split(indices, num_chunks)]
    n_per = len(indices) // num_chunks
    chunks: List[List[int]] = [[] for _ in range(num_chunks)]
    loads = [0] * num_chunks
    for idx in indices:
        j = min(range(num_chunks),
                key=lambda c: loads[c] if len(chunks[c]) < n_per else np.inf)
        chunks[j].append(int(idx))
        loads[j] += abs(int(lengths[idx]))
    return chunks


def get_length_grouped_indices(lengths: Sequence[int], batch_size: int,
                               world_size: int = 1, *,
                               group_by_modality: bool = True,
                               generator: Optional[np.random.RandomState] = None
                               ) -> List[int]:
    g = generator or np.random.RandomState(0)
    lengths = np.asarray(lengths)
    mega = batch_size * world_size * 4  # megabatch granularity (ref: *world*4)

    def grouped(idx: np.ndarray) -> List[np.ndarray]:
        perm = idx[g.permutation(len(idx))]
        megabatches = [perm[i:i + mega] for i in range(0, len(perm), mega)]
        return [mb[np.argsort(-np.abs(lengths[mb]), kind="stable")]
                for mb in megabatches]

    if group_by_modality and (lengths > 0).any() and (lengths < 0).any():
        mm = grouped(np.flatnonzero(lengths > 0))
        lang = grouped(np.flatnonzero(lengths < 0))
        megabatches = mm + lang
        order = g.permutation(len(megabatches))
        megabatches = [megabatches[i] for i in order]
    else:
        megabatches = grouped(np.arange(len(lengths)))

    out: List[int] = []
    for mb in megabatches:
        for chunk in _split_to_even_chunks(mb, lengths, world_size):
            out.extend(chunk)
    return out


class LengthGroupedSampler:
    """Iterable of dataset indices for DataLoader(sampler=...)."""

    def __init__(self, lengths: Sequence[int], batch_size: int,
                 world_size: int = 1, group_by_modality: bool = True,
                 seed: int = 0):
        self.lengths = lengths
        self.batch_size = batch_size
        self.world_size = world_size
        self.group_by_modality = group_by_modality
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return len(self.lengths)

    def __iter__(self):
        g = np.random.RandomState(self.seed + self._epoch)
        self._epoch += 1
        return iter(get_length_grouped_indices(
            self.lengths, self.batch_size, self.world_size,
            group_by_modality=self.group_by_modality, generator=g))
