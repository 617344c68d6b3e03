"""Concrete dataset recipes: COCO caption / VQA / CLIP pretrain / ChatML.

Rebuild of the reference's dataset builders (paddlemix/datasets/
caption_dataset.py:28-113, coco_vqa.py:29-139, coco_clip.py:26-85,
chatml_dataset.py:26-62), registered under ``load_dataset`` names. The
reference auto-downloads coco.tar from BOS; here data must be pre-staged
under ``data_root`` (default $PMIX_DATA_HOME or ~/.paddlemix_tpu/datasets)
— TPU pods pull datasets onto the host ahead of time, never mid-training.

Annotation formats are the reference's exactly (Karpathy coco splits,
vqa_train.json, conversations-list ChatML), so recipes are drop-in."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Union

from .dataset import DATASETS, MapDataset


def _data_home() -> str:
    return os.environ.get(
        "PMIX_DATA_HOME",
        os.path.join(os.path.expanduser("~"), ".paddlemix_tpu", "datasets"))


def _load_json(path: str):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"dataset file {path!r} not found — stage the data locally "
            f"(reference downloads coco.tar; set PMIX_DATA_HOME or pass "
            f"data_root)")
    with open(path) as f:
        return json.load(f)


def _image_stem_id(image_name: str) -> str:
    """'COCO_val2014_000000391895.jpg' -> '000000391895'
    (reference caption_dataset.py:77)."""
    return image_name.split("/")[-1].strip(".jpg").split("_")[-1]


def _dense_image_ids(annotations, key: str = "image_id") -> Dict:
    ids: Dict = {}
    for ann in annotations:
        img_id = ann.get(key) if key in ann else _image_stem_id(ann["image"])
        if img_id not in ids:
            ids[img_id] = len(ids)
    return ids


@DATASETS.register("coco_caption")
def coco_caption(splits: Union[str, Sequence[str], None] = "train",
                 data_root: Optional[str] = None, **kwargs):
    """Karpathy-split COCO captions (reference caption_dataset.py:28-113).
    train rows: {image, image_id, text_input}; eval rows: {image, image_id}."""
    root = data_root or os.path.join(_data_home(), "coco")
    single = isinstance(splits, str)
    out = []
    for split in [splits] if single else list(splits or ["train"]):
        anno = _load_json(os.path.join(
            root, "annotations", f"coco_karpathy_{split}.json"))
        rows = []
        if split == "train":
            image_ids = _dense_image_ids(anno)
            for ann in anno:
                rows.append({"image": os.path.join(root, "images", ann["image"]),
                             "image_id": image_ids[ann["image_id"]],
                             "text_input": ann["caption"]})
        else:
            for ann in anno:
                rows.append({"image": os.path.join(root, "images", ann["image"]),
                             "image_id": _image_stem_id(ann["image"])})
        out.append(MapDataset(rows))
    return out[0] if single else out


@DATASETS.register("coco_vqa")
def coco_vqa(splits: Union[str, Sequence[str], None] = "train",
             data_root: Optional[str] = None, **kwargs):
    """VQAv2 over COCO images (reference coco_vqa.py:29-139).
    train rows: {image, text_input, answers, image_ids};
    eval rows: {image, text_input, question_id, image_id}."""
    root = data_root or os.path.join(_data_home(), "coco")
    single = isinstance(splits, str)
    out = []
    for split in [splits] if single else list(splits or ["train"]):
        rows = []
        if split == "train":
            anno = []
            for name in ("vqa_train.json", "vqa_val.json"):
                path = os.path.join(root, "annotations", name)
                if os.path.exists(path):
                    anno.extend(_load_json(path))
            if not anno:
                _load_json(os.path.join(root, "annotations", "vqa_train.json"))
            for ann in anno:
                rows.append({"image": os.path.join(root, "images", ann["image"]),
                             "text_input": ann["question"],
                             "answers": ann["answer"],
                             "image_ids": _image_stem_id(ann["image"])})
        else:
            anno = _load_json(os.path.join(
                root, "annotations", "vqa_val_eval.json"))
            for ann in anno:
                rows.append({"image": os.path.join(root, "images", ann["image"]),
                             "text_input": ann["question"],
                             "question_id": ann["question_id"],
                             "image_id": _image_stem_id(ann["image"]),
                             "image_ids": ann.get(
                                 "image_ids", _image_stem_id(ann["image"]))})
        out.append(MapDataset(rows))
    return out[0] if single else out


@DATASETS.register("coco_clip")
def coco_clip(splits: Union[str, Sequence[str], None] = "train",
              data_root: Optional[str] = None, **kwargs):
    """CLIP contrastive pretrain pairs over Karpathy COCO
    (reference coco_clip.py:26-85). train rows: {image, text}."""
    root = data_root or os.path.join(_data_home(), "coco")
    single = isinstance(splits, str)
    out = []
    for split in [splits] if single else list(splits or ["train"]):
        anno = _load_json(os.path.join(
            root, "annotations", f"coco_karpathy_{split}.json"))
        rows = []
        for ann in anno:
            row = {"image": os.path.join(root, "images", ann["image"])}
            if split == "train":
                row["text"] = ann["caption"]
            rows.append(row)
        out.append(MapDataset(rows))
    return out[0] if single else out


def apply_chat_template(conversations: List, template: Dict) -> str:
    """Minimal ChatML rendering (reference chatml_dataset.py:26-62 defers to
    PaddleNLP's ChatTemplateMixin; here a dict template with 'system',
    'user', 'assistant' format strings, e.g.
    {"system": "<|im_start|>system\\n{}<|im_end|>\\n",
     "user": "<|im_start|>user\\n{}<|im_end|>\\n",
     "assistant": "<|im_start|>assistant\\n{}<|im_end|>\\n"})."""
    parts = []
    if template.get("system_message"):
        parts.append(template["system"].format(template["system_message"]))
    for turn in conversations:
        if isinstance(turn, dict):  # {"from": ..., "value": ...}
            role = {"human": "user", "gpt": "assistant"}.get(
                turn.get("from", "user"), turn.get("from", "user"))
            parts.append(template[role].format(turn["value"]))
        elif isinstance(turn, (list, tuple)):
            if len(turn) > 0 and turn[0] != "":
                parts.append(template["user"].format(turn[0]))
            if len(turn) > 1:
                parts.append(template["assistant"].format(turn[1]))
            elif len(turn) == 1 and turn[0] == "":
                parts.append(template["assistant"].split("{}")[0])
    return "".join(parts)


@DATASETS.register("chatml")
def chatml(splits: Union[str, Sequence[str], None] = "train",
           data_root: Optional[str] = None,
           chat_template: Optional[Dict] = None, **kwargs):
    """Conversation SFT data (reference chatml_dataset.py:26-62).
    rows: {conversations, image?}; with chat_template, conversations are
    rendered to a single prompt string ending with the assistant header."""
    root = data_root or os.path.join(_data_home(), "chatml")
    names = {"train": "train.json", "val": "eval.json", "test": "test.json"}
    single = isinstance(splits, str)
    out = []
    for split in [splits] if single else list(splits or ["train"]):
        anno = _load_json(os.path.join(root, names.get(split, split)))
        rows = []
        for ann in anno:
            conversations = ann["conversations"]
            if chat_template is not None:
                conversations = list(conversations) + [[""]]
                conversations = apply_chat_template(conversations,
                                                    chat_template)
            row = {"conversations": conversations}
            if "image" in ann:
                row["image"] = ann["image"]
            rows.append(row)
        out.append(MapDataset(rows))
    return out[0] if single else out
