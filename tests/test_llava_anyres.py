"""LLaVA-NeXT anyres (VERDICT r4 task 4): grid-pinpoint selection, tile +
global splice, unpad, image_newline — token counts and merged features
checked against an independent numpy twin of the reference math
(paddlemix/models/llava/base_model.py:101-205, mm_utils.py:55-181; identical
to HF transformers' LLaVA-NeXT pack_image_features)."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from paddlemix_tpu.processors.llava_processing import (
    LLAVA_16_GRID_PINPOINTS,
    LlavaProcessor,
    anyres_num_tokens,
    divide_to_patches,
    get_anyres_image_grid_shape,
    process_anyres_image,
    resize_and_pad_image,
    select_best_resolution,
    unpad_hw,
)


def test_select_best_resolution_and_counts():
    # 640x480 landscape -> (672, 672): highest effective resolution
    assert select_best_resolution((640, 480), LLAVA_16_GRID_PINPOINTS) == (672, 672)
    # the HF-documented token count for llava-1.6 @ 640x480 is 2340:
    # 576 base + 36 rows x (48 cols + newline)
    assert anyres_num_tokens((640, 480), LLAVA_16_GRID_PINPOINTS, 336, 14) == 2340
    # extreme portrait picks the 336x1008 pinpoint
    assert select_best_resolution((300, 900), LLAVA_16_GRID_PINPOINTS) == (336, 1008)
    assert get_anyres_image_grid_shape((300, 900), LLAVA_16_GRID_PINPOINTS, 336) == (1, 3)
    # square image: no unpad slicing, full grid + newlines
    assert anyres_num_tokens((672, 672), LLAVA_16_GRID_PINPOINTS, 336, 14) \
        == 576 + 48 * 49


def test_resize_pad_and_divide():
    img = np.arange(40 * 50 * 3, dtype=np.uint8).reshape(40, 50, 3)
    out = resize_and_pad_image(img, (64, 64))
    assert out.shape == (64, 64, 3)
    # aspect preserved: 50x40 -> 64x51 centered, black bars top+bottom
    assert out[:6].max() == 0 and out[-6:].max() == 0
    tiles = divide_to_patches(out, 32)
    assert len(tiles) == 4 and all(t.shape == (32, 32, 3) for t in tiles)


def _numpy_reference_merge(feats, image_size, side, nw, nh, newline):
    """Independent twin of the reference unpad merge (base_model.py:182-205):
    operates channel-first like the paddle code."""
    base, tiles = feats[0], feats[1:]
    d = feats.shape[-1]
    x = tiles.reshape(nh, nw, side, side, d)
    x = np.transpose(x, (4, 0, 2, 1, 3)).reshape(d, nh * side, nw * side)
    ow, oh = image_size
    ch, cw = x.shape[1:]
    if ow / oh > cw / ch:
        new_h = int(oh * (cw / ow))
        pad = (ch - new_h) // 2
        x = x[:, pad:ch - pad, :]
    else:
        new_w = int(ow * (ch / oh))
        pad = (cw - new_w) // 2
        x = x[:, :, pad:cw - pad]
    nl = np.broadcast_to(newline[:, None, None], (d, x.shape[1], 1))
    x = np.concatenate([x, nl], axis=2)
    x = x.reshape(d, -1).T
    return np.concatenate([base, x], axis=0)


def _tiny_cfg():
    from paddlemix_tpu.models.llava import LlavaConfig

    return LlavaConfig(
        vision_config=dict(hidden_size=16, intermediate_size=32,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8),
        text_config=dict(vocab_size=64, hidden_size=24, intermediate_size=48,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=512),
        image_token_index=60,
        image_aspect_ratio="anyres",
        image_grid_pinpoints=((32, 64), (64, 32), (64, 64)),
        mm_patch_merge_type="spatial_unpad")


def test_merge_matches_numpy_reference():
    import jax

    from paddlemix_tpu.models.llava import LlavaForConditionalGeneration

    cfg = _tiny_cfg()
    model = LlavaForConditionalGeneration.from_config(cfg, seed=0)
    side = 4
    image_size = (50, 40)  # -> best (64, 64), 2x2 tiles
    nw, nh = get_anyres_image_grid_shape(image_size, cfg.image_grid_pinpoints, 32)
    assert (nw, nh) == (2, 2)
    rs = np.random.RandomState(0)
    feats = rs.randn(1 + nw * nh, side * side, 24).astype(np.float32)
    got = model.module.apply({"params": model.params}, jnp.asarray(feats),
                             image_size,
                             method=model.module.merge_anyres_features)
    newline = np.asarray(model.params["image_newline"])
    want = _numpy_reference_merge(feats, image_size, side, nw, nh, newline)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    expect_tokens = anyres_num_tokens(image_size, cfg.image_grid_pinpoints,
                                      32, 8)
    assert got.shape == (expect_tokens, 24)


def test_anyres_end_to_end_processor_model_contract():
    """The processor's token count must equal the model's merged feature
    count — the splice contract — and generate() must run."""
    from paddlemix_tpu.models.llava import LlavaForConditionalGeneration
    from paddlemix_tpu.processors.clip_processing import CLIPImageProcessor

    cfg = _tiny_cfg()
    model = LlavaForConditionalGeneration.from_config(cfg, seed=0)
    proc = LlavaProcessor(
        image_processor=CLIPImageProcessor(size=32, crop_size=32),
        image_aspect_ratio="anyres",
        image_grid_pinpoints=cfg.image_grid_pinpoints,
        mm_patch_merge_type="spatial_unpad",
        vision_patch_size=8, image_token_index=cfg.image_token_index)
    img = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (40, 50, 3), np.uint8))
    data = proc(images=img, prompt_ids=[5, cfg.image_token_index, 7, 9])
    n = data["num_tokens"]
    assert data["pixel_values"].shape[0] == 5  # global + 2x2 tiles
    assert data["input_ids"].shape == (1, 3 + n)

    merged = model.module.apply(
        {"params": model.params}, jnp.asarray(data["pixel_values"]),
        tuple(data["image_sizes"][0]),
        method=model.module.encode_images_anyres)
    assert merged.shape[1] == n

    logits, _ = model(jnp.asarray(data["input_ids"]),
                      jnp.asarray(data["pixel_values"]),
                      image_sizes=data["image_sizes"])
    assert logits.shape == (1, 3 + n, 64)
    assert bool(jnp.all(jnp.isfinite(logits)))

    out = model.generate(data["input_ids"],
                         pixel_values=data["pixel_values"],
                         image_sizes=data["image_sizes"], max_new_tokens=3,
                         eos_token_id=-1)
    assert out.shape[1] == 3
