"""NaViT patch-n-pack tests: packing, isolation between packed images,
readout masking, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.models.navit import (
    NaViTConfig,
    NaViTModel,
    group_images_by_max_seq_len,
    image_to_patches,
    pack_images,
)

CFG = dict(image_size=32, patch_size=8, num_classes=5, dim=32, depth=2,
           heads=2, dim_head=8, mlp_dim=64, max_seq_len=48,
           max_images_per_pack=4)


def img(h, w, seed=0):
    return np.random.default_rng(seed).normal(size=(h, w, 3)).astype(np.float32)


def test_image_to_patches_layout():
    im = np.arange(8 * 16 * 3, dtype=np.float32).reshape(8, 16, 3)
    patches, pos = image_to_patches(im, 8)
    assert patches.shape == (2, 3 * 64) and pos.shape == (2, 2)
    assert pos.tolist() == [[0, 0], [0, 1]]
    # first patch holds the left 8x8 block, channel-major within the patch
    np.testing.assert_allclose(patches[0].reshape(3, 8, 8)[0],
                               im[:8, :8, 0])


def test_group_images_greedy():
    images = [img(32, 32), img(16, 16), img(32, 16), img(8, 8)]
    groups = group_images_by_max_seq_len(images, 8, max_seq_len=20)
    # 16 + 4 = 20 fits; 8 starts a new group; 1 joins it
    assert [len(g) for g in groups] == [2, 2]
    with pytest.raises(AssertionError):
        group_images_by_max_seq_len([img(64, 64)], 8, max_seq_len=20)


def test_pack_images_static_buffers():
    packed = pack_images([[img(16, 16), img(8, 8)], [img(32, 8)]],
                         patch_size=8, max_seq_len=16)
    assert packed["patches"].shape == (2, 16, 192)
    assert packed["image_ids"][0, :4].tolist() == [0, 0, 0, 0]
    assert packed["image_ids"][0, 4] == 1
    assert packed["image_ids"][0, 5:].tolist() == [-1] * 11
    assert packed["num_images"].tolist() == [2, 1]


def test_token_dropout_keeps_fraction():
    packed = pack_images([[img(32, 32)]], patch_size=8, max_seq_len=16,
                         token_dropout_prob=0.5,
                         rng=np.random.default_rng(0))
    assert (packed["image_ids"][0] >= 0).sum() == 8  # 16 patches * 0.5


def test_packed_isolation():
    """An image's logits must be identical packed alone vs packed with
    other images — the segment mask forbids cross-image attention."""
    model = NaViTModel.from_config(NaViTConfig(**CFG))
    a, b = img(16, 16, 1), img(24, 8, 2)
    solo = model.classify([[a]])
    packed = model.classify([[a, b]])
    np.testing.assert_allclose(solo[0][0], packed[0][0], atol=2e-5)


def test_classify_flattens_valid_images():
    model = NaViTModel.from_config(NaViTConfig(**CFG))
    rows = model.classify([[img(16, 16), img(8, 8)], [img(8, 16)]])
    assert len(rows) == 2
    assert rows[0].shape == (2, 5) and rows[1].shape == (1, 5)
    assert np.isfinite(rows[0]).all()


def test_padding_rows_do_not_affect_logits():
    """Extending the pack buffer with more padding must not change logits."""
    model = NaViTModel.from_config(NaViTConfig(**CFG))
    p1 = pack_images([[img(16, 16, 3)]], 8, max_seq_len=8)
    p2 = pack_images([[img(16, 16, 3)]], 8, max_seq_len=48)
    l1, v1 = model(*(jnp.asarray(p1[k]) for k in
                     ("patches", "positions", "image_ids", "num_images")))
    l2, v2 = model(*(jnp.asarray(p2[k]) for k in
                     ("patches", "positions", "image_ids", "num_images")))
    np.testing.assert_allclose(np.asarray(l1[0, 0]), np.asarray(l2[0, 0]),
                               atol=2e-5)


def test_navit_training_step():
    import optax

    model = NaViTModel.from_config(NaViTConfig(**CFG))
    packed = pack_images(
        [[img(16, 16, i), img(8, 8, i + 10)] for i in range(2)],
        patch_size=8, max_seq_len=48)
    batch = {k: jnp.asarray(v) for k, v in packed.items()}
    labels = jnp.asarray([[0, 1, 0, 0], [2, 3, 0, 0]], jnp.int32)
    tx = optax.adam(1e-3)
    params = model.params
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, valid = model.module.apply(
                {"params": p}, batch["patches"], batch["positions"],
                batch["image_ids"], batch["num_images"])
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return jnp.sum(losses * valid) / jnp.sum(valid)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
