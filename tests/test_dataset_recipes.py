"""COCO caption / VQA / CLIP / ChatML dataset recipe tests (synthetic
annotation files in the reference's formats)."""

import json
import os

import pytest

from paddlemix_tpu.datasets import load_dataset
from paddlemix_tpu.datasets.recipes import apply_chat_template


@pytest.fixture()
def coco_root(tmp_path):
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "images").mkdir()
    train = [
        {"image": "train2014/COCO_train2014_000000001.jpg",
         "image_id": "1", "caption": "a cat"},
        {"image": "train2014/COCO_train2014_000000001.jpg",
         "image_id": "1", "caption": "a small cat"},
        {"image": "train2014/COCO_train2014_000000002.jpg",
         "image_id": "2", "caption": "a dog"},
    ]
    val = [{"image": "val2014/COCO_val2014_000000391895.jpg", "image_id": "x"}]
    (root / "annotations" / "coco_karpathy_train.json").write_text(
        json.dumps(train))
    (root / "annotations" / "coco_karpathy_val.json").write_text(
        json.dumps(val))
    vqa_train = [{"image": "train2014/COCO_train2014_000000001.jpg",
                  "question": "what animal?", "answer": ["cat", "cat"]}]
    vqa_eval = [{"image": "val2014/COCO_val2014_000000391895.jpg",
                 "question": "what?", "question_id": 7}]
    (root / "annotations" / "vqa_train.json").write_text(json.dumps(vqa_train))
    (root / "annotations" / "vqa_val_eval.json").write_text(
        json.dumps(vqa_eval))
    return str(root)


def test_coco_caption_train_rows(coco_root):
    ds = load_dataset("coco_caption", splits="train", data_root=coco_root)
    assert len(ds) == 3
    row = ds[0]
    assert row["text_input"] == "a cat"
    assert row["image"].endswith("COCO_train2014_000000001.jpg")
    # dense image ids: two unique images -> ids 0 and 1
    assert {r["image_id"] for r in ds} == {0, 1}


def test_coco_caption_val_rows_use_stem_ids(coco_root):
    ds = load_dataset("coco_caption", splits="val", data_root=coco_root)
    assert ds[0]["image_id"] == "000000391895"
    assert "text_input" not in ds[0]


def test_coco_caption_multi_split(coco_root):
    train, val = load_dataset("coco_caption", splits=["train", "val"],
                              data_root=coco_root)
    assert len(train) == 3 and len(val) == 1


def test_coco_vqa_train_and_eval(coco_root):
    tr = load_dataset("coco_vqa", splits="train", data_root=coco_root)
    assert tr[0]["answers"] == ["cat", "cat"]
    assert tr[0]["image_ids"] == "000000001"
    ev = load_dataset("coco_vqa", splits="val", data_root=coco_root)
    assert ev[0]["question_id"] == 7


def test_coco_clip_pairs(coco_root):
    ds = load_dataset("coco_clip", splits="train", data_root=coco_root)
    assert len(ds) == 3 and ds[0]["text"] == "a cat"
    ev = load_dataset("coco_clip", splits="val", data_root=coco_root)
    assert "text" not in ev[0]


def test_missing_data_raises_with_guidance(tmp_path):
    with pytest.raises(FileNotFoundError, match="stage the data"):
        load_dataset("coco_caption", splits="train",
                     data_root=str(tmp_path / "nope"))


CHATML_TEMPLATE = {
    "system": "<|im_start|>system\n{}<|im_end|>\n",
    "system_message": "You are helpful.",
    "user": "<|im_start|>user\n{}<|im_end|>\n",
    "assistant": "<|im_start|>assistant\n{}<|im_end|>\n",
}


def test_chatml_raw_and_templated(tmp_path):
    data = [{"conversations": [{"from": "human", "value": "hi"},
                               {"from": "gpt", "value": "hello"}],
             "image": "a.jpg"},
            {"conversations": [["q1", "a1"]]}]
    (tmp_path / "train.json").write_text(json.dumps(data))
    raw = load_dataset("chatml", splits="train", data_root=str(tmp_path))
    assert raw[0]["image"] == "a.jpg"
    assert raw[0]["conversations"][0]["value"] == "hi"
    templated = load_dataset("chatml", splits="train",
                             data_root=str(tmp_path),
                             chat_template=CHATML_TEMPLATE)
    text = templated[1]["conversations"]
    assert text.startswith("<|im_start|>system\nYou are helpful.")
    assert "<|im_start|>user\nq1<|im_end|>" in text
    # trailing empty turn leaves the assistant header open for generation
    assert text.endswith("<|im_start|>assistant\n")


def test_apply_chat_template_dict_turns():
    text = apply_chat_template(
        [{"from": "human", "value": "q"}, {"from": "gpt", "value": "a"}],
        CHATML_TEMPLATE)
    assert "user\nq" in text and "assistant\na" in text
