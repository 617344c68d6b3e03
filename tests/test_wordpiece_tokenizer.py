import numpy as np
import pytest
from paddlemix_tpu.utils.tokenizer import WordPieceTokenizer

VOCAB = {t: i for i, t in enumerate(
    ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", "?", "a", "cat", "dog",
     "play", "##ing", "##ful", "un", "##affable"])}


def test_wordpiece_greedy_longest_match():
    tok = WordPieceTokenizer(VOCAB)
    assert tok.encode("playing", add_special_tokens=False) == [
        VOCAB["play"], VOCAB["##ing"]]
    assert tok.encode("unaffable", add_special_tokens=False) == [
        VOCAB["un"], VOCAB["##affable"]]


def test_wordpiece_specials_and_unknown():
    tok = WordPieceTokenizer(VOCAB)
    ids = tok.encode("a cat.")
    assert ids[0] == VOCAB["[CLS]"] and ids[-1] == VOCAB["[SEP]"]
    assert VOCAB["."] in ids
    assert tok.encode("zzz", add_special_tokens=False) == [VOCAB["[UNK]"]]


def test_wordpiece_decode_rejoins_pieces():
    tok = WordPieceTokenizer(VOCAB)
    ids = tok.encode("a playful dog")
    assert tok.decode(ids) == "a playful dog"


def test_wordpiece_batch_call_pads():
    tok = WordPieceTokenizer(VOCAB)
    out = tok(["a cat", "a playful dog playing"])
    assert out["input_ids"].shape == out["attention_mask"].shape
    assert out["attention_mask"][0].sum() < out["attention_mask"][1].sum()


def test_convert_tokens_to_ids():
    tok = WordPieceTokenizer(VOCAB)
    assert tok.convert_tokens_to_ids(["[CLS]", ".", "nope"]) == [
        VOCAB["[CLS]"], VOCAB["."], VOCAB["[UNK]"]]
