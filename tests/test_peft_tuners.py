"""LoHA / LoKR / OFT / prompt-tuning adapter tests (reference
ppdiffusers/peft/tuners/): factor shapes, identity-at-init, training signal,
and OFT's norm preservation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.peft import (
    LoHaConfig,
    LoKrConfig,
    OFTConfig,
    PromptTuningConfig,
    apply_prompt,
    loha_init,
    loha_merge,
    lokr_init,
    lokr_merge,
    oft_init,
    oft_merge,
    peft_loss_fn,
    prompt_init,
)

PARAMS = {
    "layer": {"q_proj": {"kernel": jax.random.normal(jax.random.PRNGKey(0),
                                                     (12, 8))}},
    "other": {"bias": jnp.zeros((8,))},
}


def test_loha_identity_at_init_then_changes():
    cfg = LoHaConfig(r=2)
    facs = loha_init(PARAMS, cfg, jax.random.PRNGKey(1))
    merged = loha_merge(PARAMS, facs, cfg)
    # b2 starts at zero -> delta 0
    np.testing.assert_allclose(np.asarray(merged["layer"]["q_proj"]["kernel"]),
                               np.asarray(PARAMS["layer"]["q_proj"]["kernel"]),
                               atol=1e-6)
    facs[("layer", "q_proj", "kernel")]["b2"] = jnp.ones((2, 8))
    merged2 = loha_merge(PARAMS, facs, cfg)
    assert float(jnp.abs(merged2["layer"]["q_proj"]["kernel"] -
                         PARAMS["layer"]["q_proj"]["kernel"]).max()) > 0


def test_lokr_kron_shapes():
    cfg = LoKrConfig(r=2)
    facs = lokr_init(PARAMS, cfg, jax.random.PRNGKey(1))
    f = facs[("layer", "q_proj", "kernel")]
    in1, out1 = f["w1"].shape
    in2 = f["a2"].shape[0]
    out2 = f["b2"].shape[1]
    assert in1 * in2 == 12 and out1 * out2 == 8
    merged = lokr_merge(PARAMS, facs, cfg)
    assert merged["layer"]["q_proj"]["kernel"].shape == (12, 8)
    # zero-init b2 -> identity
    np.testing.assert_allclose(np.asarray(merged["layer"]["q_proj"]["kernel"]),
                               np.asarray(PARAMS["layer"]["q_proj"]["kernel"]),
                               atol=1e-6)


def test_oft_orthogonal_and_identity():
    cfg = OFTConfig(block_size=4)
    facs = oft_init(PARAMS, cfg, jax.random.PRNGKey(1))
    merged = oft_merge(PARAMS, facs, cfg)
    np.testing.assert_allclose(np.asarray(merged["layer"]["q_proj"]["kernel"]),
                               np.asarray(PARAMS["layer"]["q_proj"]["kernel"]),
                               atol=1e-5)
    # random skew: rotation preserves the per-column norm contribution of
    # each block-row group (R is orthogonal)
    facs[("layer", "q_proj", "kernel")]["skew"] = \
        jax.random.normal(jax.random.PRNGKey(2), (3, 4, 4)) * 0.3
    rotated = oft_merge(PARAMS, facs, cfg)["layer"]["q_proj"]["kernel"]
    w = PARAMS["layer"]["q_proj"]["kernel"]
    for blk in range(3):
        np.testing.assert_allclose(
            float(jnp.linalg.norm(rotated[blk * 4:(blk + 1) * 4])),
            float(jnp.linalg.norm(w[blk * 4:(blk + 1) * 4])), rtol=1e-4)
    assert float(jnp.abs(rotated - w).max()) > 1e-3


def test_peft_loss_trains_only_factors():
    cfg = LoHaConfig(r=2)
    facs = loha_init(PARAMS, cfg, jax.random.PRNGKey(1))

    def base_loss(params, batch, rng):
        return jnp.sum(params["layer"]["q_proj"]["kernel"] ** 2)

    fn = peft_loss_fn(base_loss, PARAMS, loha_merge, cfg)
    grads = jax.grad(fn)(facs, None, None)
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total)
    # b2 is zero but gets gradient through the Hadamard product partner
    g = grads[("layer", "q_proj", "kernel")]
    assert g["a1"].shape == (12, 2) and g["b2"].shape == (2, 8)


def test_prompt_tuning_prepends():
    cfg = PromptTuningConfig(num_virtual_tokens=4, token_dim=8)
    prompt = prompt_init(cfg, jax.random.PRNGKey(0))
    embeds = jnp.ones((2, 5, 8))
    out = apply_prompt(prompt, embeds)
    assert out.shape == (2, 9, 8)
    np.testing.assert_allclose(np.asarray(out[:, 4:]), np.asarray(embeds))
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(prompt),
                               atol=1e-6)
