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


# --------------------------------------------------- prefix / p-tuning
def test_prefix_tuning_kv_shapes_and_attention():
    from paddlemix_tpu.ops import scaled_dot_product_attention
    from paddlemix_tpu.peft import (
        PrefixTuningConfig,
        concat_prefix_kv,
        prefix_init,
        prefix_past_key_values,
    )

    cfg = PrefixTuningConfig(num_virtual_tokens=4, token_dim=16, num_layers=3,
                             num_attention_heads=2)
    params = prefix_init(cfg, jax.random.PRNGKey(0))
    assert params["embedding"].shape == (4, 2 * 3 * 16)
    pkv = prefix_past_key_values(params, cfg, batch_size=2)
    assert pkv.shape == (3, 2, 2, 4, 2, 8)

    q = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 2, 8))
    k = v = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 2, 8))
    k2, v2 = concat_prefix_kv(k, v, pkv[0])
    assert k2.shape == (2, 9, 2, 8)
    base = scaled_dot_product_attention(q, k, v)
    with_pref = scaled_dot_product_attention(q, k2, v2)
    assert float(jnp.abs(base - with_pref).max()) > 1e-4  # prefix is attended

    # gradient reaches the adapter through the attention
    def loss(p):
        pkv = prefix_past_key_values(p, cfg, 2)
        k2, v2 = concat_prefix_kv(k, v, pkv[0])
        return jnp.sum(scaled_dot_product_attention(q, k2, v2) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["embedding"]).sum()) > 0


def test_prefix_projection_mode():
    from paddlemix_tpu.peft import PrefixTuningConfig, prefix_encode, prefix_init

    cfg = PrefixTuningConfig(num_virtual_tokens=4, token_dim=16, num_layers=2,
                             num_attention_heads=2, encoder_hidden_size=8,
                             prefix_projection=True)
    params = prefix_init(cfg, jax.random.PRNGKey(0))
    assert params["embedding"].shape == (4, 16)  # token_dim, then MLP expands
    out = prefix_encode(params, cfg)
    assert out.shape == (4, 2 * 2 * 16)
    g = jax.grad(lambda p: jnp.sum(prefix_encode(p, cfg) ** 2))(params)
    assert float(jnp.abs(g["transform"]["fc1"]["kernel"]).sum()) > 0


def test_p_tuning_mlp_and_lstm():
    from paddlemix_tpu.peft import PromptEncoderConfig, p_tuning_encode, p_tuning_init

    for enc in ("MLP", "LSTM"):
        cfg = PromptEncoderConfig(num_virtual_tokens=4, token_dim=8,
                                  encoder_hidden_size=6,
                                  encoder_reparameterization_type=enc)
        params = p_tuning_init(cfg, jax.random.PRNGKey(0))
        out = p_tuning_encode(params, cfg)
        assert out.shape == (4, 8), enc
        g = jax.grad(lambda p: jnp.sum(p_tuning_encode(p, cfg) ** 2))(params)
        assert float(jnp.abs(g["embedding"]).sum()) > 0, enc


def test_p_tuning_lstm_matches_torch():
    """The hand-rolled bidirectional LSTM scan vs torch.nn.LSTM."""
    import torch

    from paddlemix_tpu.peft.prefix import _lstm_scan

    d, h, n = 8, 6, 5
    torch.manual_seed(0)
    lstm = torch.nn.LSTM(d, h, num_layers=1, bidirectional=True,
                         batch_first=True).eval()
    x = np.random.RandomState(0).randn(n, d).astype(np.float32)
    with torch.no_grad():
        ref, _ = lstm(torch.from_numpy(x)[None])

    def params(sfx):
        sd = lstm.state_dict()
        return {"wx": jnp.asarray(sd[f"weight_ih_l0{sfx}"].numpy().T),
                "wh": jnp.asarray(sd[f"weight_hh_l0{sfx}"].numpy().T),
                "b": jnp.asarray((sd[f"bias_ih_l0{sfx}"]
                                  + sd[f"bias_hh_l0{sfx}"]).numpy())}

    got = jnp.concatenate([_lstm_scan(params(""), jnp.asarray(x)),
                           _lstm_scan(params("_reverse"), jnp.asarray(x),
                                      reverse=True)], -1)
    np.testing.assert_allclose(np.asarray(got), ref[0].numpy(),
                               atol=1e-5, rtol=1e-4)
