"""DataCopilot ops: analysis + schema conversion.

Rebuild of the reference's paddlemix/datacopilot/ops/ (analysis/_info.py,
convert/_schema.py MM<->MIX conversion) without the rich/console dependency —
plain text summaries, pure-python converters, usable from MMDataset.map."""

from __future__ import annotations

import collections
from typing import Any, Dict, List, Optional

from .dataset import MMDataset


# ------------------------------------------------------------------ analysis
def info(dataset: MMDataset) -> Dict[str, Any]:
    """Dataset summary (reference ops/analysis/_info.py:24)."""
    n = len(dataset.items)
    n_images = sum(1 for it in dataset.items
                   if isinstance(it, dict) and (it.get("image") or it.get("images")))
    turns = [len(it.get("conversations", [])) for it in dataset.items
             if isinstance(it, dict)]
    out = {
        "length": n,
        "with_image": n_images,
        "avg_turns": (sum(turns) / len(turns)) if turns else 0.0,
        "max_turns": max(turns) if turns else 0,
    }
    for k, v in out.items():
        print(f"- {k}: {v}")
    return out


def head(dataset: MMDataset, n: int = 10) -> List[Any]:
    """First-n preview (reference ops/analysis/_info.py:38)."""
    items = dataset.items[:n]
    for it in items:
        if isinstance(it, dict):
            print({k: it[k] for k in ("id", "image", "conversations")
                   if k in it})
        else:
            print(it)
    return items


def value_counts(dataset: MMDataset, key: str) -> Dict[Any, int]:
    """Frequency table over a field."""
    c = collections.Counter(it.get(key) for it in dataset.items
                            if isinstance(it, dict))
    return dict(c)


def token_length_stats(dataset: MMDataset, tokenizer=None) -> Dict[str, float]:
    """Per-sample text length stats (whitespace tokens unless a tokenizer is
    given) — the breadth the reference's analysis examples compute."""
    lens = []
    for it in dataset.items:
        if not isinstance(it, dict):
            continue
        text = " ".join(c.get("value", "") for c in it.get("conversations", []))
        lens.append(len(tokenizer(text)["input_ids"][0]) if tokenizer
                    else len(text.split()))
    if not lens:
        return {"count": 0}
    lens.sort()
    return {"count": len(lens), "mean": sum(lens) / len(lens),
            "p50": lens[len(lens) // 2], "max": lens[-1]}


# ------------------------------------------------------------------- convert
def convert_mm_to_mix(item: Dict[str, Any]) -> Dict[str, Any]:
    """LLaVA "MM" schema -> MIX schema (reference ops/convert/_schema.py:20):
    the single `image` becomes an indexed image list and the <image>
    placeholder becomes <image>0</image>."""
    images = [{"id": 0, "url": item["image"]}] if "image" in item else None
    conversations = []
    for conv in item.get("conversations", []):
        if conv.get("from") == "human":
            role = "user"
            value = conv.get("value", "")
            if "image" in item:
                value = (value.replace("<image>", "<image>0</image>")
                         if "<image>" in value
                         else "<image>0</image>\n" + value)
        else:
            role = "assistant"
            value = conv.get("value", "")
        conversations.append({"from": role, "value": value})
    return {"id": item.get("id"), "images": images,
            "conversations": conversations}


def convert_mix_to_mm(item: Dict[str, Any]) -> Dict[str, Any]:
    """MIX -> MM (inverse of convert_mm_to_mix for single-image items)."""
    images = item.get("images") or []
    out: Dict[str, Any] = {"id": item.get("id")}
    if images:
        out["image"] = images[0].get("url")
    conversations = []
    for conv in item.get("conversations", []):
        role = "human" if conv.get("from") == "user" else "gpt"
        value = conv.get("value", "").replace("<image>0</image>", "<image>")
        conversations.append({"from": role, "value": value})
    out["conversations"] = conversations
    return out


def is_valid_mm(item: Any) -> bool:
    """Schema validity check (reference core is_valid_schema)."""
    return (isinstance(item, dict) and "conversations" in item and
            isinstance(item["conversations"], list) and
            all(isinstance(c, dict) and "from" in c and "value" in c
                for c in item["conversations"]))
