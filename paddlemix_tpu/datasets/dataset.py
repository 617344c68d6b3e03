"""Dataset core: registry + MapDataset with shard/map/filter.

Rebuild of the reference dataset layer (paddlemix/datasets/dataset.py:
load_dataset registry, MapDataset with .shard() :302)."""

from __future__ import annotations

import json
import os
import random
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence

from ..utils.registry import Registry

DATASETS = Registry("datasets")


class MapDataset:
    def __init__(self, data: Sequence[Any]):
        self.data = list(data)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]

    def __iter__(self):
        return iter(self.data)

    def map(self, fn: Callable, lazy: bool = False) -> "MapDataset":
        if lazy:
            return _LazyMapDataset(self, fn)
        return MapDataset([fn(x) for x in self.data])

    def filter(self, fn: Callable) -> "MapDataset":
        return MapDataset([x for x in self.data if fn(x)])

    def shard(self, num_shards: int, index: int, contiguous: bool = False) -> "MapDataset":
        """Reference dataset.py:302."""
        if contiguous:
            div = len(self) // num_shards
            mod = len(self) % num_shards
            start = div * index + min(index, mod)
            end = start + div + (1 if index < mod else 0)
            return MapDataset(self.data[start:end])
        return MapDataset(self.data[index::num_shards])

    def shuffle(self, seed: int = 0) -> "MapDataset":
        data = list(self.data)
        random.Random(seed).shuffle(data)
        return MapDataset(data)

    def select(self, indices: Iterable[int]) -> "MapDataset":
        return MapDataset([self.data[i] for i in indices])


class _LazyMapDataset(MapDataset):
    def __init__(self, base: MapDataset, fn: Callable):
        self.base, self.fn = base, fn
        self.data = None  # type: ignore

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        return self.fn(self.base[i])

    def __iter__(self):
        for x in self.base:
            yield self.fn(x)


class ConcatDataset(MapDataset):
    """Reference internvl_dataset.py ConcatDataset."""

    def __init__(self, datasets: Sequence[MapDataset]):
        data = []
        for d in datasets:
            data.extend(list(d))
        super().__init__(data)


class WeightedConcatDataset(MapDataset):
    """Reference internvl_dataset.py WeightedConcatDataset: sample datasets by
    weight with replacement to a fixed size."""

    def __init__(self, datasets: Sequence[MapDataset], weights: Sequence[float],
                 size: Optional[int] = None, seed: int = 0):
        rng = random.Random(seed)
        total = sum(weights)
        size = size or sum(len(d) for d in datasets)
        data = []
        for _ in range(size):
            r = rng.random() * total
            acc = 0.0
            for d, w in zip(datasets, weights):
                acc += w
                if r <= acc:
                    data.append(d[rng.randrange(len(d))])
                    break
        super().__init__(data)


def load_dataset(name_or_path: str, splits=None, **kwargs):
    """Registry lookup or json/jsonl file load (reference load_dataset)."""
    if name_or_path in DATASETS:
        return DATASETS.get(name_or_path)(splits=splits, **kwargs)
    if os.path.isfile(name_or_path):
        if name_or_path.endswith(".jsonl"):
            with open(name_or_path) as f:
                return MapDataset([json.loads(l) for l in f if l.strip()])
        if name_or_path.endswith(".json"):
            with open(name_or_path) as f:
                return MapDataset(json.load(f))
    raise ValueError(f"unknown dataset {name_or_path!r}")
