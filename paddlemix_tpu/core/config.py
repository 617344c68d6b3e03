"""Config system: a json-round-trippable dataclass base.

TPU-native replacement for the reference's two config systems:
 - ppdiffusers ``ConfigMixin.register_to_config`` (reference
   ppdiffusers/ppdiffusers/configuration_utils.py:58-256)
 - paddlemix per-model PretrainedConfig usage (paddlemix/auto/configuration.py)

Here every model/scheduler/processor config is a plain ``@dataclass`` inheriting
``BaseConfig``; constructor args ARE the persisted config (no hidden frozen-dict
magic), and unknown keys from foreign checkpoints are kept in ``.unused_kwargs``
so diffusers/transformers config.json files load unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple, Type, TypeVar

from ..utils.log import logger

T = TypeVar("T", bound="BaseConfig")

CONFIG_NAME = "config.json"


@dataclasses.dataclass
class BaseConfig:
    """Base class for all configs. Subclass as a @dataclass."""

    # non-field class attributes
    config_name = CONFIG_NAME
    model_type = ""

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["model_type"] = type(self).model_type
        d["_class_name"] = type(self).__name__
        return d

    def to_json_string(self) -> str:
        def _default(o):
            if hasattr(o, "tolist"):
                return o.tolist()
            if isinstance(o, (set, tuple)):
                return list(o)
            return str(o)

        return json.dumps(self.to_dict(), indent=2, sort_keys=True, default=_default) + "\n"

    def save_pretrained(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        with open(os.path.join(save_directory, self.config_name), "w") as f:
            f.write(self.to_json_string())

    @classmethod
    def from_dict(cls: Type[T], data: Dict[str, Any], **overrides) -> T:
        data = dict(data)
        data.update(overrides)
        field_names = {f.name for f in dataclasses.fields(cls)}
        kept = {k: v for k, v in data.items() if k in field_names}
        unused = {k: v for k, v in data.items() if k not in field_names}
        # tuples serialize as lists; coerce back for fields typed as tuple
        for f in dataclasses.fields(cls):
            if f.name in kept and isinstance(kept[f.name], list):
                origin = getattr(f.type, "__origin__", None)
                if origin is tuple or (isinstance(f.type, str) and f.type.startswith("Tuple")):
                    kept[f.name] = tuple(kept[f.name])
        cfg = cls(**kept)
        object.__setattr__(cfg, "unused_kwargs", unused)
        return cfg

    @classmethod
    def from_pretrained(cls: Type[T], pretrained_path: str, subfolder: Optional[str] = None, **overrides) -> T:
        from ..utils.hub import resolve_file

        path = resolve_file(pretrained_path, cls.config_name, subfolder=subfolder)
        with open(path) as f:
            data = json.load(f)
        return cls.from_dict(data, **overrides)

    @classmethod
    def load_config(cls, pretrained_path: str, subfolder: Optional[str] = None) -> Dict[str, Any]:
        from ..utils.hub import resolve_file

        path = resolve_file(pretrained_path, cls.config_name, subfolder=subfolder)
        with open(path) as f:
            return json.load(f)

    def replace(self: T, **changes) -> T:
        return dataclasses.replace(self, **changes)


def config_diff(cfg: BaseConfig, other: BaseConfig) -> Dict[str, Tuple[Any, Any]]:
    a, b = cfg.to_dict(), other.to_dict()
    return {k: (a.get(k), b.get(k)) for k in set(a) | set(b) if a.get(k) != b.get(k)}
