"""DataCopilot-lite: multimodal dataset ops toolkit.

Rebuild of the reference datacopilot core (paddlemix/datacopilot/core/
dataset.py:28-190 MMDataset: map/filter/shuffle/sample/export json/jsonl/h5;
misc/_parallelmap.py parallel map). H5 export is gated on h5py presence."""

from __future__ import annotations

import enum
import json
import os
import random
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterable, List, Optional, Sequence


class ParallelMode(str, enum.Enum):
    SEQUENTIAL = "sequential"
    THREAD = "thread"


class MMDataset:
    def __init__(self, items: Optional[Sequence[Any]] = None):
        self.items: List[Any] = list(items or [])

    # ------------------------------------------------------------ io
    @classmethod
    def from_json(cls, path: str) -> "MMDataset":
        with open(path) as f:
            return cls(json.load(f))

    @classmethod
    def from_jsonl(cls, path: str) -> "MMDataset":
        with open(path) as f:
            return cls([json.loads(l) for l in f if l.strip()])

    @classmethod
    def from_auto(cls, path: str) -> "MMDataset":
        if path.endswith(".jsonl"):
            return cls.from_jsonl(path)
        return cls.from_json(path)

    def export_json(self, path: str, indent: int = 2):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.items, f, indent=indent, ensure_ascii=False)

    def export_jsonl(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w") as f:
            for item in self.items:
                f.write(json.dumps(item, ensure_ascii=False) + "\n")

    def export_h5(self, path: str, key: str = "data"):
        import h5py  # optional dependency

        with h5py.File(path, "w") as f:
            f.create_dataset(key, data=json.dumps(self.items))

    # ------------------------------------------------------------ ops
    def map(self, fn: Callable, mode: ParallelMode = ParallelMode.SEQUENTIAL,
            max_workers: int = 8, progress: bool = False) -> "MMDataset":
        if mode == ParallelMode.THREAD:
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                return MMDataset(list(pool.map(fn, self.items)))
        return MMDataset([fn(x) for x in self.items])

    def filter(self, fn: Callable) -> "MMDataset":
        return MMDataset([x for x in self.items if fn(x)])

    def shuffle(self, seed: int = 0) -> "MMDataset":
        items = list(self.items)
        random.Random(seed).shuffle(items)
        return MMDataset(items)

    def sample(self, k: int, seed: int = 0) -> "MMDataset":
        return MMDataset(random.Random(seed).sample(self.items, min(k, len(self.items))))

    def sanitize(self, required_keys: Sequence[str] = ("image", "conversations")) -> "MMDataset":
        return self.filter(lambda x: isinstance(x, dict) and all(k in x for k in required_keys))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        if isinstance(i, slice):
            return MMDataset(self.items[i])
        return self.items[i]

    def __iter__(self):
        return iter(self.items)

    def __add__(self, other: "MMDataset") -> "MMDataset":
        return MMDataset(self.items + other.items)
