"""Specialty schedulers: RePaint, score-SDE VE, UnCLIP, consistency decoder,
Karras VE.

Rebuilds of the reference's scheduling_repaint.py, scheduling_sde_ve.py,
scheduling_unclip.py, scheduling_consistency_decoder.py and
deprecated/scheduling_karras_ve.py as explicit-state pure solvers. RePaint's
time-travel (jump) schedule is precomputed into a flat array of (timestep,
is_undo) pairs so the whole inpainting loop — including undo re-noising —
runs as one lax.fori_loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import Scheduler, SchedulerConfig


# ------------------------------------------------------------------ RePaint
@dataclasses.dataclass
class RePaintConfig(SchedulerConfig):
    model_type = "repaint"
    eta: float = 0.0
    clip_sample: bool = True


class RePaintState(NamedTuple):
    timesteps: jnp.ndarray  # (M,) int32 — travel schedule incl. revisits
    is_undo: jnp.ndarray    # (M,) bool — True = undo (re-noise) transition
    num_inference_steps: int


class RePaintScheduler(Scheduler):
    """RePaint inpainting (reference scheduling_repaint.py). ``step`` denoises
    and merges the known region re-noised to t-1; ``undo_step`` walks one
    step back toward noise. ``unified_step`` dispatches on state.is_undo so a
    single fori_loop can run the full jump schedule."""

    config_class = RePaintConfig

    def set_timesteps(self, num_inference_steps: int, jump_length: int = 10,
                      jump_n_sample: int = 10) -> RePaintState:
        n = self.config.num_train_timesteps
        num_inference_steps = min(n, num_inference_steps)
        self._ratio = n // num_inference_steps
        jumps = {}
        for j in range(0, num_inference_steps - jump_length, jump_length):
            jumps[j] = jump_n_sample - 1
        ts, undo = [], []
        t = num_inference_steps
        while t >= 1:
            t -= 1
            ts.append(t * self._ratio)
            undo.append(False)
            if jumps.get(t, 0) > 0:
                jumps[t] -= 1
                for _ in range(jump_length):
                    t += 1
                    ts.append(t * self._ratio)
                    undo.append(True)
        return RePaintState(jnp.asarray(ts, jnp.int32), jnp.asarray(undo),
                            num_inference_steps)

    def _variance(self, t):
        acp = self.alphas_cumprod
        prev_t = jnp.maximum(t - self._ratio, -1)
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], 1.0)
        return (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)

    def step(self, state: RePaintState, model_output, i, sample,
             original_image, mask, key):
        """Denoise transition at schedule position i, merging the known
        region (mask==1 keeps original content)."""
        cfg = self.config
        t = state.timesteps[i]
        acp = self.alphas_cumprod
        prev_t = jnp.maximum(t - self._ratio, -1)
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], 1.0)
        b_t = 1.0 - a_t

        x0 = (sample - b_t ** 0.5 * model_output) / a_t ** 0.5
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        k1, k2 = jax.random.split(key)
        std = cfg.eta * jnp.sqrt(jnp.maximum(self._variance(t), 0.0))
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - std ** 2, 0.0)) * model_output
        prev_unknown = a_prev ** 0.5 * x0 + dir_xt
        prev_unknown = prev_unknown + std * jax.random.normal(k1, sample.shape,
                                                              jnp.float32).astype(sample.dtype)
        noise = jax.random.normal(k2, sample.shape, jnp.float32).astype(sample.dtype)
        prev_known = a_prev ** 0.5 * original_image + (1.0 - a_prev) ** 0.5 * noise
        return mask * prev_known + (1.0 - mask) * prev_unknown, state

    def undo_step(self, state: RePaintState, i, sample, key):
        """Re-noise one ratio's worth of betas (time travel forward)."""
        t = state.timesteps[i]
        betas = 1.0 - jnp.concatenate(
            [self.alphas_cumprod[:1], self.alphas_cumprod[1:] / self.alphas_cumprod[:-1]])

        def body(j, carry):
            x, key = carry
            key, sub = jax.random.split(key)
            beta = betas[jnp.minimum(t - self._ratio + j + 1,
                                     len(betas) - 1)]
            noise = jax.random.normal(sub, x.shape, jnp.float32).astype(x.dtype)
            return (1.0 - beta) ** 0.5 * x + beta ** 0.5 * noise, key

        out, _ = jax.lax.fori_loop(0, self._ratio, body, (sample, key))
        return out, state


# -------------------------------------------------------------- score-SDE VE
@dataclasses.dataclass
class ScoreSdeVeConfig(SchedulerConfig):
    model_type = "score_sde_ve"
    num_train_timesteps: int = 2000
    snr: float = 0.15
    sigma_min: float = 0.01
    sigma_max: float = 1348.0
    sampling_eps: float = 1e-5
    correct_steps: int = 1


class SdeVeState(NamedTuple):
    timesteps: jnp.ndarray  # (N,) float continuous times
    sigmas: jnp.ndarray     # (N,)
    num_inference_steps: int


class ScoreSdeVeScheduler(Scheduler):
    """Variance-exploding SDE predictor-corrector sampler (reference
    scheduling_sde_ve.py): ``step_pred`` is the reverse-diffusion predictor,
    ``step_correct`` the Langevin corrector."""

    config_class = ScoreSdeVeConfig
    order = 1

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        self.alphas_cumprod = None

    @property
    def init_noise_sigma(self) -> float:
        return self.config.sigma_max

    def set_timesteps(self, num_inference_steps: int,
                      sampling_eps: float = None) -> SdeVeState:
        cfg = self.config
        eps = sampling_eps or cfg.sampling_eps
        ts = np.linspace(1.0, eps, num_inference_steps)
        sigmas = cfg.sigma_min * (cfg.sigma_max / cfg.sigma_min) ** ts
        return SdeVeState(jnp.asarray(ts, jnp.float32),
                          jnp.asarray(sigmas, jnp.float32), num_inference_steps)

    def step_pred(self, state: SdeVeState, model_output, i, sample, key):
        sigma = state.sigmas[i]
        adjacent = jnp.where(i == state.num_inference_steps - 1,
                             jnp.float32(0.0), state.sigmas[jnp.minimum(
                                 i + 1, state.num_inference_steps - 1)])
        diffusion = jnp.sqrt(jnp.maximum(sigma ** 2 - adjacent ** 2, 0.0))
        drift = -(diffusion ** 2) * model_output
        noise = jax.random.normal(key, sample.shape, jnp.float32).astype(sample.dtype)
        x_mean = sample - drift
        return x_mean + diffusion * noise, x_mean, state

    def step_correct(self, state: SdeVeState, model_output, sample, key):
        cfg = self.config
        noise = jax.random.normal(key, sample.shape, jnp.float32).astype(sample.dtype)
        grad_norm = jnp.linalg.norm(model_output.reshape(-1))
        noise_norm = jnp.linalg.norm(noise.reshape(-1))
        step_size = (cfg.snr * noise_norm / jnp.maximum(grad_norm, 1e-12)) ** 2 * 2.0
        x_mean = sample + step_size * model_output
        return x_mean + jnp.sqrt(step_size * 2.0) * noise, state

    step = step_pred


# ------------------------------------------------------------------- UnCLIP
@dataclasses.dataclass
class UnCLIPConfig(SchedulerConfig):
    model_type = "unclip"
    variance_type: str = "fixed_small_log"  # | learned_range
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    beta_schedule: str = "squaredcos_cap_v2"


class UnCLIPState(NamedTuple):
    timesteps: jnp.ndarray
    prev_timesteps: jnp.ndarray
    num_inference_steps: int


class UnCLIPScheduler(Scheduler):
    """DDPM variant used by unCLIP/Karlo (reference scheduling_unclip.py):
    squaredcos betas, fixed_small_log or learned_range variance, and the
    model may emit concat([eps, variance_logits])."""

    config_class = UnCLIPConfig

    def set_timesteps(self, num_inference_steps: int) -> UnCLIPState:
        n = self.config.num_train_timesteps
        ts = np.linspace(0, n - 1, num_inference_steps).round()[::-1].astype(np.int64)
        prev = np.concatenate([ts[1:], [-1]])
        return UnCLIPState(jnp.asarray(ts, jnp.int32), jnp.asarray(prev, jnp.int32),
                           num_inference_steps)

    def _variance(self, t, prev_t, predicted_variance=None):
        acp = self.alphas_cumprod
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], 1.0)
        beta_now = 1.0 - a_t / a_prev
        var = (1.0 - a_prev) / (1.0 - a_t) * beta_now
        var = jnp.maximum(var, 1e-20)
        if self.config.variance_type == "fixed_small_log":
            return jnp.exp(0.5 * jnp.log(var))  # returns STD (reference quirk)
        # learned_range: interpolate between log(var) and log(beta)
        min_log = jnp.log(var)
        max_log = jnp.log(jnp.maximum(beta_now, 1e-20))
        frac = (predicted_variance + 1.0) / 2.0
        return jnp.exp(frac * max_log + (1.0 - frac) * min_log) ** 0.5

    def step(self, state: UnCLIPState, model_output, i, sample, key=None):
        cfg = self.config
        t = state.timesteps[i]
        prev_t = state.prev_timesteps[i]
        predicted_variance = None
        if cfg.variance_type == "learned_range" and \
                model_output.shape[-1] == sample.shape[-1] * 2:
            model_output, predicted_variance = jnp.split(model_output, 2, axis=-1)

        acp = self.alphas_cumprod
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], 1.0)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        alpha_now = a_t / a_prev
        beta_now = 1.0 - alpha_now

        if cfg.prediction_type == "epsilon":
            x0 = (sample - b_t ** 0.5 * model_output) / a_t ** 0.5
        else:
            x0 = model_output
        if cfg.clip_sample:
            x0 = jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)

        coef_x0 = (a_prev ** 0.5 * beta_now) / b_t
        coef_xt = (alpha_now ** 0.5 * b_prev) / b_t
        mean = coef_x0 * x0 + coef_xt * sample
        if key is not None:
            std = self._variance(t, prev_t, predicted_variance)
            noise = jax.random.normal(key, x0.shape, jnp.float32).astype(sample.dtype)
            mean = mean + jnp.where(t > 0, std, 0.0) * noise
        return mean.astype(sample.dtype), state


# ------------------------------------------------------- consistency decoder
@dataclasses.dataclass
class ConsistencyDecoderConfig(SchedulerConfig):
    model_type = "consistency_decoder"
    num_train_timesteps: int = 1024
    sigma_data: float = 0.5


class ConsistencyDecoderState(NamedTuple):
    timesteps: jnp.ndarray
    num_inference_steps: int


class ConsistencyDecoderScheduler(Scheduler):
    """2-step consistency VAE decoder schedule (reference
    scheduling_consistency_decoder.py)."""

    config_class = ConsistencyDecoderConfig

    def set_timesteps(self, num_inference_steps: int = 2) -> ConsistencyDecoderState:
        n = self.config.num_train_timesteps
        ts = np.asarray([n - 1, n // 2 - 1][:num_inference_steps], np.int64)
        return ConsistencyDecoderState(jnp.asarray(ts, jnp.int32), num_inference_steps)

    @property
    def init_noise_sigma(self) -> float:
        acp = np.asarray(self.alphas_cumprod)
        return float(np.sqrt(1.0 / acp[-1] - 1.0) * np.sqrt(acp[-1]) + 0.0) or 1.0

    def scale_model_input(self, state, sample, i):
        t = state.timesteps[i]
        acp = self.alphas_cumprod
        sigma = jnp.sqrt((1.0 - acp[t]))
        c_in = 1.0 / jnp.sqrt(acp[t] + (1.0 - acp[t]))
        return sample * c_in

    def step(self, state: ConsistencyDecoderState, model_output, i, sample, key=None):
        cfg = self.config
        t = state.timesteps[i]
        acp = self.alphas_cumprod
        sqrt_acp = jnp.sqrt(acp[t])
        sqrt_1m = jnp.sqrt(1.0 - acp[t])
        sd = cfg.sigma_data
        # consistency parameterization on the VP schedule
        sigma = sqrt_1m / jnp.maximum(sqrt_acp, 1e-8)
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        x0 = c_skip * (sample / jnp.maximum(sqrt_acp, 1e-8)) + c_out * model_output
        # re-noise to the next timestep unless done
        done = i >= state.num_inference_steps - 1
        if key is None:
            return x0.astype(sample.dtype), state
        t_next = state.timesteps[jnp.minimum(i + 1, state.num_inference_steps - 1)]
        noise = jax.random.normal(key, sample.shape, jnp.float32).astype(sample.dtype)
        renoised = jnp.sqrt(acp[t_next]) * x0 + jnp.sqrt(1.0 - acp[t_next]) * noise
        out = jnp.where(done, x0, renoised)
        return out.astype(sample.dtype), state


# ---------------------------------------------------------------- Karras VE
@dataclasses.dataclass
class KarrasVeConfig(SchedulerConfig):
    model_type = "karras_ve"
    sigma_min: float = 0.02
    sigma_max: float = 100.0
    s_noise: float = 1.007
    s_churn: float = 80.0
    s_min: float = 0.05
    s_max: float = 50.0


class KarrasVeState(NamedTuple):
    timesteps: jnp.ndarray
    sigmas: jnp.ndarray  # (N+1,) last 0
    num_inference_steps: int


class KarrasVeScheduler(Scheduler):
    """Karras et al. 2022 stochastic churn sampler (reference
    deprecated/scheduling_karras_ve.py)."""

    config_class = KarrasVeConfig
    order = 2

    def __init__(self, config=None, **kwargs):
        if config is None:
            config = self.config_class.from_dict(kwargs)
        elif kwargs:
            config = config.replace(**kwargs)
        self.config = config
        self.alphas_cumprod = None

    @property
    def init_noise_sigma(self) -> float:
        return self.config.sigma_max

    def set_timesteps(self, num_inference_steps: int) -> KarrasVeState:
        cfg = self.config
        ts = np.arange(num_inference_steps)[::-1].copy()
        # descending noise levels: sigma_max at step 0 -> sigma_min, then 0
        expo = np.arange(num_inference_steps) / max(num_inference_steps - 1, 1)
        sigmas = np.sqrt(cfg.sigma_max ** 2 *
                         (cfg.sigma_min ** 2 / cfg.sigma_max ** 2) ** expo)
        sigmas = np.concatenate([sigmas, [0.0]])
        return KarrasVeState(jnp.asarray(ts, jnp.int32),
                             jnp.asarray(sigmas, jnp.float32), num_inference_steps)

    def add_noise_to_input(self, state: KarrasVeState, sample, i, key):
        cfg = self.config
        sigma = state.sigmas[i]
        gamma = jnp.where((cfg.s_min <= sigma) & (sigma <= cfg.s_max),
                          jnp.minimum(cfg.s_churn / state.num_inference_steps,
                                      2 ** 0.5 - 1), 0.0)
        sigma_hat = sigma * (1.0 + gamma)
        eps = cfg.s_noise * jax.random.normal(key, sample.shape, jnp.float32)
        # clamp: XLA's fused rewrite of sigma_hat^2 - sigma^2 can round a
        # gamma=0 step to a tiny negative -> sqrt(NaN) inside fori_loop
        extra_var = jnp.maximum(sigma_hat ** 2 - sigma ** 2, 0.0)
        sample_hat = sample + jnp.sqrt(extra_var) * eps.astype(sample.dtype)
        return sample_hat, sigma_hat

    def step(self, state: KarrasVeState, model_output, i, sample_hat,
             sigma_hat=None, key=None):
        sigma_hat = state.sigmas[i] if sigma_hat is None else sigma_hat
        sigma_next = state.sigmas[i + 1]
        x0 = sample_hat + sigma_hat * model_output  # model predicts -score*sigma
        derivative = (sample_hat - x0) / sigma_hat
        prev = sample_hat + (sigma_next - sigma_hat) * derivative
        return prev, derivative, state

    def step_correct(self, state, model_output, i, sample_hat, sample_prev,
                     derivative, sigma_hat=None):
        sigma_hat = state.sigmas[i] if sigma_hat is None else sigma_hat
        sigma_next = state.sigmas[i + 1]
        x0 = sample_prev + sigma_next * model_output
        d_corr = (sample_prev - x0) / jnp.maximum(sigma_next, 1e-10)
        prev = sample_hat + (sigma_next - sigma_hat) * 0.5 * (derivative + d_corr)
        return prev, state
