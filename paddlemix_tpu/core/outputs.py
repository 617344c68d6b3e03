"""BaseOutput: ordered-dict/dataclass hybrid return type.

Mirrors the public behavior of the reference's BaseOutput
(ppdiffusers/ppdiffusers/utils/outputs.py): attribute access, key access,
tuple unpacking over the non-None fields.
"""

from __future__ import annotations

import dataclasses
from collections import OrderedDict


class BaseOutput(OrderedDict):
    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v is not None:
                self[f.name] = v

    def __getitem__(self, k):
        if isinstance(k, str):
            return dict(self.items())[k]
        return self.to_tuple()[k]

    def __setattr__(self, name, value):
        if name in getattr(self, "keys", lambda: [])() and value is not None:
            super().__setitem__(name, value)
        super().__setattr__(name, value)

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        super().__setattr__(key, value)

    def to_tuple(self):
        return tuple(self[k] for k in self.keys())
