"""VQ-Diffusion discrete (mask-and-replace) scheduler.

Rebuild of the reference's scheduling_vq_diffusion.py as a pure state-pytree
solver: the log transition tables (alpha/beta/gamma, stepwise + cumulative)
are precomputed at construction; ``step`` computes the reverse posterior
q(x_{t-1} | x_t, p(x_0)) fully in log space and samples with Gumbel noise —
everything static-shape, so the whole discrete denoise loop jits.

Layout: class dim LAST — samples are (B, N) int32 token maps, model outputs /
posteriors are (B, N, K[-1]) log-probabilities (the reference uses (B, C, N))."""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig


@dataclasses.dataclass
class VQDiffusionConfig(SchedulerConfig):
    model_type = "vq_diffusion"
    num_vec_classes: int = 4097  # codebook size + 1 mask class (last index)
    num_train_timesteps: int = 100
    alpha_cum_start: float = 0.99999
    alpha_cum_end: float = 0.000009
    gamma_cum_start: float = 0.000009
    gamma_cum_end: float = 0.99999


class VQDiffusionState(NamedTuple):
    timesteps: jnp.ndarray  # (N_steps,) int32 descending
    num_inference_steps: int


def _alpha_schedules(n, start, end):
    att = np.arange(n) / (n - 1) * (end - start) + start
    att = np.concatenate(([1.0], att))
    at = att[1:] / att[:-1]
    return at, np.concatenate((att[1:], [1.0]))


def _gamma_schedules(n, start, end):
    ctt = np.arange(n) / (n - 1) * (end - start) + start
    ctt = np.concatenate(([0.0], ctt))
    one_minus = 1 - ctt
    ct = 1 - one_minus[1:] / one_minus[:-1]
    return ct, np.concatenate((ctt[1:], [0.0]))


class VQDiffusionScheduler(Scheduler):
    config_class = VQDiffusionConfig

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        self.alphas_cumprod = None
        cfg = config
        self.num_embed = cfg.num_vec_classes
        self.mask_class = self.num_embed - 1
        n = cfg.num_train_timesteps
        at, att = _alpha_schedules(n, cfg.alpha_cum_start, cfg.alpha_cum_end)
        ct, ctt = _gamma_schedules(n, cfg.gamma_cum_start, cfg.gamma_cum_end)
        k = self.num_embed - 1
        bt = (1 - at - ct) / k
        btt = (1 - att - ctt) / k
        log = lambda x: jnp.asarray(np.log(np.maximum(x, 1e-40)), jnp.float32)
        self.log_at, self.log_bt, self.log_ct = log(at), log(bt), log(ct)
        self.log_cumprod_at = log(att)
        self.log_cumprod_bt = log(btt)
        self.log_cumprod_ct = log(ctt)

    def set_timesteps(self, num_inference_steps: int) -> VQDiffusionState:
        n = min(num_inference_steps, self.config.num_train_timesteps)
        ts = np.arange(0, self.config.num_train_timesteps)[::-1]
        if n < self.config.num_train_timesteps:
            idx = np.linspace(0, self.config.num_train_timesteps - 1, n)
            ts = np.round(idx)[::-1]
        return VQDiffusionState(jnp.asarray(ts, jnp.int32), int(len(ts)))

    # ---------------------------------------------------------------- math
    def _log_onehot(self, x_t):
        oh = jax.nn.one_hot(x_t, self.num_embed)  # (B, N, K)
        return jnp.log(jnp.clip(oh, 1e-30, 1.0))

    def _log_Q_transitioning(self, t, x_t, log_onehot_x_t, cumulative: bool):
        """(B, N, K-1[+1]) rows of the (cumulative) transition matrix
        (reference log_Q_t_transitioning_to_known_class)."""
        if cumulative:
            a, b, c = (self.log_cumprod_at[t], self.log_cumprod_bt[t],
                       self.log_cumprod_ct[t])
        else:
            a, b, c = self.log_at[t], self.log_bt[t], self.log_ct[t]
        from_masked = log_onehot_x_t[..., -1:]
        known = log_onehot_x_t[..., :-1]
        log_Q = jnp.logaddexp(known + a, b)
        is_mask = (x_t == self.mask_class)[..., None]
        log_Q = jnp.where(is_mask, c, log_Q)
        if not cumulative:
            log_Q = jnp.concatenate([log_Q, from_masked], axis=-1)
        return log_Q

    def _apply_cumulative(self, q, t):
        a = self.log_cumprod_at[t]
        b = self.log_cumprod_bt[t]
        c = self.log_cumprod_ct[t]
        q = jnp.logaddexp(q + a, b)
        c_col = jnp.broadcast_to(c, q.shape[:-1] + (1,))
        return jnp.concatenate([q, c_col], axis=-1)

    def q_posterior(self, log_p_x_0, x_t, t):
        """log p(x_{t-1} | x_t) from predicted log p(x_0) (B, N, K-1)."""
        log_onehot_x_t = self._log_onehot(x_t)
        log_q_x_t_given_x_0 = self._log_Q_transitioning(t, x_t, log_onehot_x_t,
                                                        cumulative=True)
        log_q_t_given_x_t_min_1 = self._log_Q_transitioning(
            t, x_t, log_onehot_x_t, cumulative=False)
        q = log_p_x_0 - log_q_x_t_given_x_0
        q_log_sum_exp = jax.scipy.special.logsumexp(q, axis=-1, keepdims=True)
        q = q - q_log_sum_exp
        q = self._apply_cumulative(q, t - 1)
        return q + log_q_t_given_x_t_min_1 + q_log_sum_exp

    def step(self, state: VQDiffusionState, model_output, i, sample, key=None):
        """model_output: (B, N, K-1) log p(x_0); sample: (B, N) int32."""
        t = state.timesteps[i]
        neg = jnp.full(model_output.shape[:-1] + (1,), -70.0, model_output.dtype)
        padded = jnp.concatenate([model_output, neg], axis=-1)  # mask never x0
        posterior = self.q_posterior(model_output, sample, t)
        logp = jnp.where(t == 0, padded, posterior)
        if key is not None:
            gumbel = -jnp.log(-jnp.log(
                jax.random.uniform(key, logp.shape, jnp.float32,
                                   minval=1e-30, maxval=1.0)))
            logp = logp + gumbel
        return jnp.argmax(logp, axis=-1).astype(sample.dtype), state
