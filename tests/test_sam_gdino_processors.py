"""SAM / GroundingDINO processor tests.

The segment-mask oracle below is an independent transcription of the
reference's loop semantics (paddlemix/processors/
groundingdino_processing.py:142-183) so the vectorized implementation is
pinned to the reference behavior, not to itself."""

import numpy as np
import pytest

from paddlemix_tpu.processors.groundingdino_processing import (
    GroundingDinoImageProcessor,
    GroundingDinoTextProcessor,
)
from paddlemix_tpu.processors.sam_processing import (
    SamImageProcessor,
    SamProcessor,
    SamPromptProcessor,
    get_preprocess_shape,
)


def oracle_masks(input_ids, special_tokens):
    """Reference loop, transcribed: iterate special-token positions, carve
    phrase spans previous_col+1..col, restart positions inside each span."""
    bs, n = input_ids.shape
    special = np.zeros((bs, n), bool)
    for t in special_tokens:
        special |= input_ids == t
    attn = np.tile(np.eye(n, dtype=bool)[None], (bs, 1, 1))
    pos = np.zeros((bs, n), np.int64)
    for row in range(bs):
        previous_col = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == n - 1:
                attn[row, col, col] = True
                pos[row, col] = 0
            else:
                attn[row, previous_col + 1: col + 1,
                     previous_col + 1: col + 1] = True
                pos[row, previous_col + 1: col + 1] = np.arange(
                    0, col - previous_col)
            previous_col = col
    return attn, pos


@pytest.mark.parametrize("ids", [
    # [CLS] cat . dog with hat . [SEP] pad pad
    [[101, 5, 119, 6, 7, 8, 119, 102, 0, 0]],
    # no trailing pads, [SEP] in last slot
    [[101, 5, 119, 6, 119, 102]],
    # two rows, different phrase structure
    [[101, 5, 119, 6, 7, 119, 102, 0],
     [101, 5, 6, 7, 119, 102, 0, 0]],
    # degenerate: no special tokens at all
    [[5, 6, 7, 8]],
])
def test_segment_masks_match_reference_loop(ids):
    ids = np.asarray(ids, np.int64)
    special = [101, 102, 119]
    got_attn, got_pos = GroundingDinoTextProcessor.generate_masks_with_special_tokens(
        ids, special)
    want_attn, want_pos = oracle_masks(ids, special)
    np.testing.assert_array_equal(got_attn, want_attn)
    np.testing.assert_array_equal(got_pos, want_pos)


def test_text_processor_call_shapes():
    tp = GroundingDinoTextProcessor(max_words=8)
    ids = np.asarray([[101, 5, 119, 6, 7, 8, 119, 102, 0, 0]])
    out = tp(ids, [101, 102, 119])
    assert out["input_ids"].shape == (1, 8)
    assert out["text_self_attention_masks"].shape == (1, 8, 8)
    assert out["position_ids"].shape == (1, 8)
    assert out["attention_mask"].tolist() == [[1] * 8]


def test_pre_caption_appends_period():
    assert GroundingDinoTextProcessor.pre_caption(" a cat ") == "a cat."
    assert GroundingDinoTextProcessor.pre_caption("a cat.") == "a cat."


def test_gdino_image_processor_pad_and_mask():
    ip = GroundingDinoImageProcessor(size=32, max_size=64, pad_multiple=16)
    im1 = np.random.randint(0, 255, (48, 96, 3), np.uint8)
    im2 = np.random.randint(0, 255, (96, 48, 3), np.uint8)
    batch, mask = ip([im1, im2])
    assert batch.shape[0] == 2 and batch.shape[-1] == 3
    assert batch.shape[1] % 16 == 0 and batch.shape[2] % 16 == 0
    # im1 resizes to (32, 64): valid region unmasked, pad masked
    assert not mask[0, :32, :64].any()
    assert mask[0, :, 64:].all()
    # padded pixels are zero
    assert batch[0][mask[0]].max() == 0.0


def test_gdino_aspect_ratio_cap():
    ip = GroundingDinoImageProcessor(size=800, max_size=1333)
    im = np.random.randint(0, 255, (200, 800, 3), np.uint8)  # 4:1 wide
    batch, mask = ip(im)
    h = (~mask[0]).any(axis=1).sum()
    w = (~mask[0]).any(axis=0).sum()
    assert w <= 1333 and abs(w / h - 4.0) < 0.1


def test_sam_image_processor_static_canvas():
    ip = SamImageProcessor(size=64)
    im = np.random.randint(0, 255, (30, 60, 3), np.uint8)
    out = ip(im)
    assert out["pixel_values"].shape == (1, 64, 64, 3)
    th, tw = out["input_size"]
    assert (th, tw) == get_preprocess_shape(30, 60, 64)
    assert out["original_size"] == (30, 60)
    # pad region is zero
    assert np.abs(out["pixel_values"][0, th:, :]).max() == 0.0


def test_sam_prompt_coords_scale():
    pp = SamPromptProcessor(size=1024)
    coords = np.asarray([[100.0, 200.0]])
    out = pp((512, 512), point_coords=coords, point_labels=np.asarray([1]))
    np.testing.assert_allclose(out["point_coords"][0, 0], [200.0, 400.0])
    assert out["point_labels"].shape == (1, 1)
    box = pp((512, 1024), box=np.asarray([[0.0, 0.0, 1024.0, 512.0]]))["boxes"]
    np.testing.assert_allclose(box[0], [[0.0, 0.0, 1024.0, 512.0]], atol=1e-4)


def test_sam_processor_end_to_end_and_postprocess():
    proc = SamProcessor(image_processor=SamImageProcessor(size=64))
    im = np.random.randint(0, 255, (30, 60, 3), np.uint8)
    enc = proc(im, input_type="points",
               point_coords=np.asarray([[10.0, 10.0]]),
               point_labels=np.asarray([1]))
    assert enc["pixel_values"].shape == (1, 64, 64, 3)
    assert "point_coords" in enc
    low = np.random.randn(1, 3, 16, 16).astype(np.float32)
    masks = proc.postprocess_masks(low, enc["input_size"],
                                   enc["original_size"])
    assert masks.shape == (1, 3, 30, 60)
    assert masks.dtype == bool


def test_sam_processor_input_validation():
    proc = SamProcessor(image_processor=SamImageProcessor(size=64))
    im = np.zeros((8, 8, 3), np.uint8)
    with pytest.raises(ValueError):
        proc(im, input_type="points")
    with pytest.raises(ValueError):
        proc(im, input_type="boxs")
