"""SAM tests: tiny-config end-to-end (points + boxes), window partitioning."""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.models.sam import SamConfig, SamModel
from paddlemix_tpu.models.sam.modeling import window_partition, window_unpartition

TINY = SamConfig(image_size=64, patch_size=8, encoder_embed_dim=32, encoder_depth=2,
                 encoder_num_heads=2, encoder_global_attn_indexes=(1,), window_size=4,
                 out_chans=16, prompt_embed_dim=16, decoder_depth=1,
                 decoder_num_heads=2, decoder_mlp_dim=32)


def test_window_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 12, 8))
    wins, pad_hw = window_partition(x, 4)
    back = window_unpartition(wins, 4, pad_hw, (10, 12))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_sam_end_to_end():
    model = SamModel.from_config(TINY, seed=0)
    px = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    points = jnp.asarray([[[0.5, 0.5], [0.2, 0.8]]])
    labels = jnp.asarray([[1, 0]], jnp.int32)
    masks, iou = model(px, points=points, point_labels=labels)
    assert masks.shape == (1, 4, 32, 32)  # 4 mask candidates, 4x-upscaled 8x8 grid
    assert iou.shape == (1, 4)
    assert bool(jnp.all(jnp.isfinite(masks)))
    # boxes prompt
    boxes = jnp.asarray([[[0.1, 0.1], [0.9, 0.9]]])
    masks2, _ = model(px, boxes=boxes)
    assert masks2.shape == (1, 4, 32, 32)
    # io round-trip
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        model.save_pretrained(d)
        model2 = SamModel.from_pretrained(d)
        m3, _ = model2(px, points=points, point_labels=labels)
        np.testing.assert_allclose(np.asarray(m3), np.asarray(masks), atol=1e-5)
