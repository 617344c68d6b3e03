"""DataCopilot ops tests: analysis, MM<->MIX schema round trip, LID, tagger
(reference paddlemix/datacopilot/ops + nn)."""

from paddlemix_tpu.datacopilot import (
    FastTextLIDModel,
    MMDataset,
    PPInsCapTagger,
    convert_mix_to_mm,
    convert_mm_to_mix,
    filter_by_language,
    info,
    is_valid_mm,
    language_of,
    token_length_stats,
    value_counts,
)

SAMPLE = {
    "id": "0001",
    "image": "img/0001.jpg",
    "conversations": [
        {"from": "human", "value": "<image>\nWhat is shown?"},
        {"from": "gpt", "value": "A dog playing in the park."},
    ],
}


def test_info_and_stats():
    ds = MMDataset([SAMPLE, dict(SAMPLE, id="0002")])
    out = info(ds)
    assert out["length"] == 2 and out["with_image"] == 2
    stats = token_length_stats(ds)
    assert stats["count"] == 2 and stats["mean"] > 0
    assert value_counts(ds, "image")["img/0001.jpg"] == 2


def test_schema_roundtrip():
    assert is_valid_mm(SAMPLE)
    mix = convert_mm_to_mix(SAMPLE)
    assert mix["images"][0]["url"] == "img/0001.jpg"
    assert mix["conversations"][0]["from"] == "user"
    assert "<image>0</image>" in mix["conversations"][0]["value"]
    back = convert_mix_to_mm(mix)
    assert back["image"] == "img/0001.jpg"
    assert back["conversations"][0]["from"] == "human"
    assert "<image>" in back["conversations"][0]["value"]


def test_language_id():
    assert language_of("the quick brown fox jumps over the lazy dog and it is") == "en"
    assert language_of("这是一段中文文本，用于测试语言识别功能。") == "zh"
    assert language_of("これは日本語のテキストです。") == "ja"
    labels, scores = FastTextLIDModel().predict("el perro corre por el parque y la casa de los", k=2)
    assert labels[0] == "__label__es"


def test_filter_by_language():
    en = dict(SAMPLE, conversations=[
        {"from": "human", "value": "what is the name of it and the color"},
        {"from": "gpt", "value": "it is the red one in the park"}])
    zh = dict(SAMPLE, id="z", conversations=[
        {"from": "human", "value": "这张图片里有什么？"},
        {"from": "gpt", "value": "一只狗在公园里玩耍。"}])
    ds = MMDataset([en, zh])
    assert len(filter_by_language(ds, "zh").items) == 1


def test_inscaptagger():
    tagger = PPInsCapTagger(lambda prompt: "coherent, detailed")
    tagged = tagger(SAMPLE)
    assert tagged["tags"] == ["coherent", "detailed"]
    ds = tagger.tag_dataset(MMDataset([SAMPLE, SAMPLE]))
    assert all(it["tags"] for it in ds.items)
