"""Qwen2-VL tests: processor geometry, get_rope_index, forward, generation,
HF parity for the vision tower + full model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.models.qwen2_vl import (
    Qwen2VLConfig,
    Qwen2VLForConditionalGeneration,
    get_rope_index,
)
from paddlemix_tpu.processors.qwen2_vl_processing import (
    Qwen2VLImageProcessor,
    extract_patches,
    smart_resize,
    vision_patch_positions,
)

TINY = dict(
    vision_config=dict(depth=2, embed_dim=32, num_heads=2, patch_size=4,
                       spatial_merge_size=2, temporal_patch_size=2, hidden_size=48,
                       mlp_ratio=2.0),
    text_config=dict(vocab_size=160, hidden_size=48, intermediate_size=96,
                     num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
                     max_position_embeddings=128, eos_token_id=2),
    image_token_id=150,
    video_token_id=151,
    mrope_section=(4, 6, 6),  # sums to head_dim/2 = 12... head_dim=24 -> 12
)


def test_smart_resize():
    h, w = smart_resize(300, 500, factor=28)
    assert h % 28 == 0 and w % 28 == 0
    # tiny image upscaled to at least factor
    h, w = smart_resize(10, 10, factor=28)
    assert h >= 28 and w >= 28


def test_extract_patches_and_positions():
    img = np.random.RandomState(0).rand(16, 24, 3).astype(np.float32)
    patches, grid = extract_patches(img, patch_size=4, merge_size=2)
    assert grid == (1, 4, 6)
    assert patches.shape == (24, 3 * 2 * 16)
    pos = vision_patch_positions([grid], merge_size=2)
    assert pos.shape == (24, 2)
    # first 4 patches form the top-left 2x2 block
    np.testing.assert_array_equal(pos[:4], [[0, 0], [0, 1], [1, 0], [1, 1]])


def test_get_rope_index():
    # text(2) + image(1x2x2 grid merged -> 1 token? grid pre-merge 2x2, merge 2 -> 1) + text
    ids = np.asarray([[5, 7, 150, 9, 11]])
    grid = np.asarray([[1, 2, 2]])
    pos = get_rope_index(ids, grid, image_token_id=150, video_token_id=151,
                         spatial_merge_size=2)
    assert pos.shape == (3, 1, 5)
    np.testing.assert_array_equal(pos[0, 0], [0, 1, 2, 3, 4])  # t stream
    np.testing.assert_array_equal(pos[1, 0], [0, 1, 2, 3, 4])  # single merged patch


def test_forward_and_generate():
    cfg = Qwen2VLConfig.from_dict(dict(TINY, mrope_section=(4, 4, 4)))
    model = Qwen2VLForConditionalGeneration.from_config(cfg, seed=0)
    proc = Qwen2VLImageProcessor(patch_size=4, merge_size=2, temporal_patch_size=2,
                                 min_pixels=8 * 8, max_pixels=64 * 64, pad_to_multiple=32)
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    enc = proc([img])
    n_img_tokens = int(np.prod(enc["image_grid_thw"][0])) // 4
    ids = np.full((1, n_img_tokens + 4), 5, np.int64)
    ids[:, 1: 1 + n_img_tokens] = 150
    pos = get_rope_index(ids, enc["image_grid_thw"], 150, 151, 2)
    logits, _ = model(jnp.asarray(ids.astype(np.int32)), jnp.asarray(pos.astype(np.int32)),
                      jnp.asarray(enc["pixel_patches"]),
                      jnp.asarray(enc["patch_pos_hw"]), jnp.asarray(enc["patch_segments"]))
    assert logits.shape == (1, ids.shape[1], 160)
    assert bool(jnp.all(jnp.isfinite(logits)))

    out = model.generate(ids.astype(np.int32), jnp.asarray(pos.astype(np.int32)),
                         jnp.asarray(enc["pixel_patches"]),
                         jnp.asarray(enc["patch_pos_hw"]),
                         jnp.asarray(enc["patch_segments"]), max_new_tokens=4)
    assert out.shape == (1, 4)


def test_hf_qwen2_vl_parity(tmp_path):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "Qwen2VLForConditionalGeneration"):
        pytest.skip("transformers lacks Qwen2VL")
    hf_cfg = transformers.Qwen2VLConfig(
        vision_config=dict(depth=2, embed_dim=32, num_heads=2, patch_size=4,
                           spatial_merge_size=2, temporal_patch_size=2, hidden_size=48,
                           mlp_ratio=2.0, in_channels=3),
        vocab_size=160, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=2, num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=1000000.0, image_token_id=150, video_token_id=151,
        vision_start_token_id=149, rope_scaling={"type": "mrope", "mrope_section": [4, 4, 4]},
        tie_word_embeddings=False,
    )
    hf = transformers.Qwen2VLForConditionalGeneration(hf_cfg).eval()
    hf.save_pretrained(str(tmp_path), safe_serialization=True)

    model = Qwen2VLForConditionalGeneration.from_pretrained(str(tmp_path))
    proc = Qwen2VLImageProcessor(patch_size=4, merge_size=2, temporal_patch_size=2,
                                 min_pixels=8 * 8, max_pixels=64 * 64, pad_to_multiple=4)
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    enc = proc([img])
    n_img = int(np.prod(enc["image_grid_thw"][0])) // 4
    ids = np.full((1, n_img + 4), 5, np.int64)
    ids[:, 1: 1 + n_img] = 150
    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(enc["pixel_patches"][0]),
            image_grid_thw=torch.tensor(enc["image_grid_thw"]),
        ).logits.numpy()
    pos = get_rope_index(ids, enc["image_grid_thw"], 150, 151, 2)
    logits, _ = model(jnp.asarray(ids.astype(np.int32)), jnp.asarray(pos.astype(np.int32)),
                      jnp.asarray(enc["pixel_patches"]),
                      jnp.asarray(enc["patch_pos_hw"]), jnp.asarray(enc["patch_segments"]))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=5e-3)


def test_video_patches():
    from paddlemix_tpu.processors.qwen2_vl_processing import extract_patches, smart_nframes

    video = np.random.RandomState(0).rand(5, 16, 24, 3).astype(np.float32)  # 5 frames
    patches, grid = extract_patches(video, patch_size=4, merge_size=2,
                                    temporal_patch_size=2)
    assert grid == (3, 4, 6)  # 5 frames padded to 6 -> 3 temporal groups
    assert patches.shape == (3 * 24, 3 * 2 * 16)
    # single image still matches the old path
    p1, g1 = extract_patches(video[0], patch_size=4)
    assert g1 == (1, 4, 6)
    assert smart_nframes(300, fps=2.0, video_fps=30.0) == 20
    assert smart_nframes(3, fps=2.0, video_fps=30.0) >= 2


def test_video_rope_index():
    # video grid (t=2, h=2, w=2) -> merged tokens 2*1*1=2 with distinct t stream
    ids = np.asarray([[5, 151, 151, 9]])
    grid = np.asarray([[2, 2, 2]])
    pos = get_rope_index(ids, grid, image_token_id=150, video_token_id=151,
                         spatial_merge_size=2)
    np.testing.assert_array_equal(pos[0, 0], [0, 1, 2, 3])  # t advances per frame
    np.testing.assert_array_equal(pos[1, 0], [0, 1, 1, 3])  # h constant per frame
