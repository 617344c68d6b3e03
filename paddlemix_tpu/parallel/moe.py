"""Mixture-of-experts feed-forward with expert parallelism, TPU-native.

GShard/Switch-style top-k routing with a static capacity (no ragged shapes —
everything stays MXU-tileable): tokens are dispatched into an (experts,
capacity, d) tensor by one-hot einsums, expert weights carry a leading
experts axis sharded over the "expert" mesh axis, and a sharding constraint
on the dispatched tensor lets XLA insert the all-to-alls. Overflowing tokens
are dropped (standard capacity-factor semantics); the auxiliary load-balance
loss is returned for the trainer."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P


def _constrain(x, spec):
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except Exception:  # outside jit / no mesh: no-op
        return x


class MoEFeedForward(nn.Module):
    """Drop-in FFN replacement: (B, S, D) -> (B, S, D) plus aux loss."""

    num_experts: int = 8
    hidden_mult: int = 4
    top_k: int = 2
    capacity_factor: float = 1.25
    expert_axis: Optional[str] = "expert"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        e = self.num_experts
        n = b * s
        h = d * self.hidden_mult
        cap = max(int(self.top_k * n / e * self.capacity_factor), 1)

        router = self.param("router", nn.initializers.normal(0.02), (d, e))
        wi = self.param("wi", nn.initializers.normal(0.02), (e, d, h))
        wo = self.param("wo", nn.initializers.normal(0.02), (e, h, d))

        tokens = x.reshape(n, d)
        logits = (tokens.astype(jnp.float32) @ router.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)  # (N, E)

        # aux load-balance loss (Switch eq. 4): E * sum(fraction * prob)
        density = jnp.mean(gates, axis=0)

        dispatch = jnp.zeros((n, e, cap), jnp.float32)
        combine = jnp.zeros((n, e, cap), jnp.float32)
        remaining = gates
        filled = jnp.zeros((e,), jnp.float32)  # slots used per expert so far
        for _ in range(self.top_k):
            choice = jnp.argmax(remaining, axis=-1)  # (N,)
            onehot = jax.nn.one_hot(choice, e)  # (N, E)
            # rank of each token within its chosen expert for this round,
            # offset by slots filled in earlier rounds
            rank = jnp.cumsum(onehot, axis=0) - onehot  # tokens before me
            pos = jnp.sum((rank + filled[None]) * onehot, axis=-1)  # (N,)
            keep = pos < cap
            pos_oh = jax.nn.one_hot(jnp.clip(pos, 0, cap - 1).astype(jnp.int32), cap)
            mask = (onehot * keep[:, None].astype(jnp.float32))[:, :, None] \
                * pos_oh[:, None, :]
            dispatch = dispatch + mask
            combine = combine + mask * jnp.sum(gates * onehot, -1)[:, None, None]
            filled = filled + jnp.sum(onehot * keep[:, None], axis=0)
            remaining = remaining * (1.0 - onehot)

        frac = jnp.mean(dispatch.sum(-1), axis=0)  # fraction routed per expert
        aux_loss = e * jnp.sum(frac * density)

        spec = P(self.expert_axis) if self.expert_axis else None
        xin = jnp.einsum("nec,nd->ecd", dispatch.astype(x.dtype), tokens)
        if spec is not None:
            xin = _constrain(xin, spec)
        hmid = jax.nn.gelu(jnp.einsum("ecd,edh->ech", xin, wi.astype(x.dtype)))
        xout = jnp.einsum("ech,ehd->ecd", hmid, wo.astype(x.dtype))
        if spec is not None:
            xout = _constrain(xout, spec)
        y = jnp.einsum("nec,ecd->nd", combine.astype(x.dtype), xout)
        self.sow("intermediates", "moe_aux_loss", aux_loss)
        return y.reshape(b, s, d)


def moe_param_spec(expert_axis: str = "expert"):
    """Sharding rules for MoE params: experts axis sharded, rest replicated."""
    return (
        (r".*\b(wi|wo)$", P(expert_axis)),
        (r".*\brouter$", P()),
    )
