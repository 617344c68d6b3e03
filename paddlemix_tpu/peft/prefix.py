"""Prefix tuning (P-Tuning v2) + P-Tuning prompt encoder.

Rebuild of the reference's remaining prompt-learning tuners
(ppdiffusers/peft/tuners/prefix_tuning/model.py PrefixEncoder and
ppdiffusers/peft/tuners/p_tuning/model.py PromptEncoder) in the same
functional design as the rest of this package: parameters are plain pytrees
created by an `*_init`, the encode functions are pure and jit-able, and the
trainer differentiates only the adapter tree.

- Prefix tuning: learned per-layer KV prefixes. The encoder maps virtual
  token ids to (n_virt, 2 * num_layers * token_dim) — directly via an
  embedding table, or through a two-layer tanh MLP when prefix_projection
  (P-Tuning v2 vs vanilla prefix tuning). `prefix_past_key_values` reshapes
  to per-layer K/V blocks that `concat_prefix_kv` prepends to attention K/V.
- P-Tuning: virtual-token embeddings reparameterized through an MLP
  (Linear-ReLU-Linear-ReLU-Linear, the reference's fixed 2-hidden-layer head)
  or a 1-layer bidirectional LSTM + 2-layer head; the output embeds prepend
  to input embeds exactly like prompt tuning (`apply_prompt`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.config import BaseConfig


# ----------------------------------------------------------- prefix tuning
@dataclasses.dataclass
class PrefixTuningConfig(BaseConfig):
    model_type = "prefix_tuning"
    num_virtual_tokens: int = 20
    token_dim: int = 768           # base model hidden size
    num_layers: int = 12
    num_attention_heads: int = 12
    encoder_hidden_size: int = 768
    prefix_projection: bool = False  # True = P-Tuning-v2 MLP reparam
    init_std: float = 0.02


def prefix_init(config: PrefixTuningConfig, rng):
    """Adapter pytree for the PrefixEncoder (reference model.py:58-76)."""
    out_dim = 2 * config.num_layers * config.token_dim
    if config.prefix_projection:
        k0, k1, k2 = jax.random.split(rng, 3)
        h = config.encoder_hidden_size
        return {
            "embedding": jax.random.normal(
                k0, (config.num_virtual_tokens, config.token_dim)) * config.init_std,
            "transform": {
                "fc1": {"kernel": jax.random.normal(k1, (config.token_dim, h))
                        * (config.token_dim ** -0.5),
                        "bias": jnp.zeros((h,))},
                "fc2": {"kernel": jax.random.normal(k2, (h, out_dim)) * (h ** -0.5),
                        "bias": jnp.zeros((out_dim,))},
            },
        }
    return {"embedding": jax.random.normal(
        rng, (config.num_virtual_tokens, out_dim)) * config.init_std}


def prefix_encode(params, config: PrefixTuningConfig):
    """(n_virt, 2*L*D) prefix activations (reference PrefixEncoder.forward)."""
    emb = params["embedding"]
    if config.prefix_projection:
        t = params["transform"]
        h = jnp.tanh(emb @ t["fc1"]["kernel"] + t["fc1"]["bias"])
        emb = h @ t["fc2"]["kernel"] + t["fc2"]["bias"]
    return emb


def prefix_past_key_values(params, config: PrefixTuningConfig, batch_size: int):
    """Per-layer KV prefixes: (num_layers, 2, B, n_virt, heads, head_dim) —
    the layout every attention in this package uses (B, S, H, Dh)."""
    n, l, d = config.num_virtual_tokens, config.num_layers, config.token_dim
    heads = config.num_attention_heads
    pkv = prefix_encode(params, config).reshape(n, l, 2, heads, d // heads)
    pkv = jnp.transpose(pkv, (1, 2, 0, 3, 4))          # (L, 2, n, H, Dh)
    return jnp.broadcast_to(pkv[:, :, None], (l, 2, batch_size, n, heads, d // heads))


def concat_prefix_kv(k, v, layer_pkv):
    """Prepend one layer's prefix to attention K/V ((B, S, H, Dh) each)."""
    pk, pv = layer_pkv[0], layer_pkv[1]
    return (jnp.concatenate([pk.astype(k.dtype), k], axis=1),
            jnp.concatenate([pv.astype(v.dtype), v], axis=1))


# ----------------------------------------------------------------- p-tuning
@dataclasses.dataclass
class PromptEncoderConfig(BaseConfig):
    model_type = "p_tuning"
    num_virtual_tokens: int = 20
    token_dim: int = 768
    encoder_hidden_size: int = 768
    encoder_reparameterization_type: str = "MLP"  # or "LSTM"
    init_std: float = 0.02


def _linear_init(rng, d_in, d_out):
    return {"kernel": jax.random.normal(rng, (d_in, d_out)) * (d_in ** -0.5),
            "bias": jnp.zeros((d_out,))}


def p_tuning_init(config: PromptEncoderConfig, rng):
    """Adapter pytree for the PromptEncoder (reference p_tuning/model.py)."""
    d, h = config.token_dim, config.encoder_hidden_size
    keys = jax.random.split(rng, 8)
    params = {"embedding": jax.random.normal(
        keys[0], (config.num_virtual_tokens, d)) * config.init_std}
    if config.encoder_reparameterization_type == "MLP":
        # fixed Linear-ReLU-Linear-ReLU-Linear head (reference :111-117)
        params["mlp_head"] = {"fc1": _linear_init(keys[1], d, h),
                              "fc2": _linear_init(keys[2], h, h),
                              "fc3": _linear_init(keys[3], h, d)}
    elif config.encoder_reparameterization_type == "LSTM":
        # 1-layer bidirectional LSTM + 2-layer head over the concat states
        def lstm_dir(k):
            kk = jax.random.split(k, 2)
            return {"wx": jax.random.normal(kk[0], (d, 4 * h)) * (d ** -0.5),
                    "wh": jax.random.normal(kk[1], (h, 4 * h)) * (h ** -0.5),
                    "b": jnp.zeros((4 * h,))}

        params["lstm_head"] = {"fwd": lstm_dir(keys[4]), "bwd": lstm_dir(keys[5])}
        params["mlp_head"] = {"fc1": _linear_init(keys[6], 2 * h, 2 * h),
                              "fc2": _linear_init(keys[7], 2 * h, d)}
    else:
        raise ValueError(
            f"unknown encoder type {config.encoder_reparameterization_type}")
    return params


def _lstm_scan(p, xs, reverse=False):
    h_dim = p["wh"].shape[0]
    def step(carry, x):
        h, c = carry
        z = x @ p["wx"] + h @ p["wh"] + p["b"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((h_dim,)), jnp.zeros((h_dim,)))
    _, hs = jax.lax.scan(step, init, xs, reverse=reverse)
    return hs


def p_tuning_encode(params, config: PromptEncoderConfig):
    """(n_virt, token_dim) reparameterized virtual-token embeddings."""
    x = params["embedding"]
    mlp = params["mlp_head"]
    if config.encoder_reparameterization_type == "LSTM":
        lstm = params["lstm_head"]
        hs = jnp.concatenate([_lstm_scan(lstm["fwd"], x),
                              _lstm_scan(lstm["bwd"], x, reverse=True)], -1)
        h = jax.nn.relu(hs @ mlp["fc1"]["kernel"] + mlp["fc1"]["bias"])
        return h @ mlp["fc2"]["kernel"] + mlp["fc2"]["bias"]
    h = jax.nn.relu(x @ mlp["fc1"]["kernel"] + mlp["fc1"]["bias"])
    h = jax.nn.relu(h @ mlp["fc2"]["kernel"] + mlp["fc2"]["bias"])
    return h @ mlp["fc3"]["kernel"] + mlp["fc3"]["bias"]
