"""Scheduler tests: each solver must reconstruct x0 from pure noise when the
model returns the exact epsilon/velocity (analytic-oracle test), and the whole
denoise loop must run inside one jitted lax.fori_loop (the design contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paddlemix_tpu.diffusers.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    EulerAncestralDiscreteScheduler,
    EulerDiscreteScheduler,
    FlowMatchEulerDiscreteScheduler,
    LCMScheduler,
)

SHAPE = (1, 8, 8, 4)


def _x0_and_noise():
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE) * 0.5
    noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    return x0, noise


def _run_vp_loop(sched, state, x0, noise, num_steps, scale_input=False):
    """Oracle: model returns the exact epsilon for the current sample."""
    acp = sched.alphas_cumprod

    def eps_oracle(sample, t):
        a = acp[jnp.clip(t.astype(jnp.int32), 0, len(acp) - 1)]
        return (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

    sample = noise * sched.init_noise_sigma

    def body(i, carry):
        sample, state = carry
        t = state.timesteps[i]
        inp = sched.scale_model_input(state, sample, i) if scale_input else sample
        if scale_input:  # euler-style sigma-space oracle
            sigma = state.sigmas[i]
            a = 1.0 / (1.0 + sigma ** 2)
            model_out = (inp - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a + 1e-12)
        else:
            model_out = eps_oracle(sample, t)
        sample, state = sched.step(state, model_out, i, sample)
        return sample, state

    final, _ = jax.lax.fori_loop(0, num_steps, body, (sample, state))
    return final


def test_ddim_recovers_x0():
    x0, noise = _x0_and_noise()
    sched = DDIMScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(20)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 20))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=5e-2)


def test_ddim_vpred_recovers_x0():
    x0, noise = _x0_and_noise()
    sched = DDIMScheduler(num_train_timesteps=1000, prediction_type="v_prediction")
    state = sched.set_timesteps(20)
    acp = sched.alphas_cumprod

    def body(i, carry):
        sample, state = carry
        t = state.timesteps[i]
        a = acp[t]
        eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
        v = jnp.sqrt(a) * eps - jnp.sqrt(1.0 - a) * x0
        return sched.step(state, v, i, sample)

    final, _ = jax.lax.fori_loop(0, 20, body, (noise, state))
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=5e-2)


def test_ddpm_converges_near_x0():
    x0, noise = _x0_and_noise()
    sched = DDPMScheduler(num_train_timesteps=1000, clip_sample=False)
    state = sched.set_timesteps(50)

    def body(i, carry):
        sample, state, key = carry
        key, sub = jax.random.split(key)
        t = state.timesteps[i]
        a = sched.alphas_cumprod[t]
        eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
        sample, state = sched.step(state, eps, i, sample, key=sub)
        return sample, state, key

    final, _, _ = jax.lax.fori_loop(0, 50, body, (noise, state, jax.random.PRNGKey(2)))
    assert float(jnp.mean((final - x0) ** 2)) < 0.15


def test_euler_recovers_x0():
    x0, noise = _x0_and_noise()
    sched = EulerDiscreteScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(40)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 40, scale_input=True))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=0.12)


def test_euler_karras_runs():
    sched = EulerDiscreteScheduler(use_karras_sigmas=True)
    state = sched.set_timesteps(10)
    assert state.sigmas.shape == (11,)
    assert float(state.sigmas[0]) > float(state.sigmas[9])


def test_euler_ancestral_runs():
    x0, noise = _x0_and_noise()
    sched = EulerAncestralDiscreteScheduler(num_train_timesteps=1000)
    state = sched.set_timesteps(25)
    sample = noise * sched.init_noise_sigma
    key = jax.random.PRNGKey(0)
    for i in range(25):
        sigma = state.sigmas[i]
        inp = sched.scale_model_input(state, sample, i)
        a = 1.0 / (1.0 + sigma ** 2)
        eps = (inp - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a + 1e-12)
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, eps, i, sample, key=sub)
    assert float(jnp.mean((sample - x0) ** 2)) < 0.2


def test_dpmsolver_recovers_x0():
    x0, noise = _x0_and_noise()
    sched = DPMSolverMultistepScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(20, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 20))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=5e-2)


def test_flow_match_recovers_x0_exactly():
    x0, noise = _x0_and_noise()
    sched = FlowMatchEulerDiscreteScheduler(shift=1.0)
    state = sched.set_timesteps(8)
    velocity = noise - x0  # exact flow for linear interpolation path

    def body(i, carry):
        sample, state = carry
        return sched.step(state, velocity, i, sample)

    final, _ = jax.jit(lambda: jax.lax.fori_loop(0, 8, body, (noise, state)))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=1e-4)


def test_flow_match_shifted_sigmas():
    sched = FlowMatchEulerDiscreteScheduler(shift=3.0)
    state = sched.set_timesteps(10)
    assert float(state.sigmas[0]) == pytest.approx(1.0, abs=1e-6)
    # shift pushes sigmas up vs unshifted
    unshifted = FlowMatchEulerDiscreteScheduler(shift=1.0).set_timesteps(10)
    assert float(state.sigmas[5]) > float(unshifted.sigmas[5])


def test_lcm_runs_and_denoises():
    x0, noise = _x0_and_noise()
    sched = LCMScheduler(num_train_timesteps=1000)
    state = sched.set_timesteps(4)
    sample = noise
    key = jax.random.PRNGKey(0)
    for i in range(4):
        t = state.timesteps[i]
        a = sched.alphas_cumprod[t]
        eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, eps, i, sample, key=sub)
    assert float(jnp.mean((sample - x0) ** 2)) < float(jnp.mean((noise - x0) ** 2))


def test_add_noise_and_velocity_roundtrip():
    x0, noise = _x0_and_noise()
    sched = DDIMScheduler()
    t = jnp.asarray([500])
    xt = sched.add_noise(x0, noise, t)
    v = sched.get_velocity(x0, noise, t)
    a = sched.alphas_cumprod[500]
    x0_rec = jnp.sqrt(a) * xt - jnp.sqrt(1 - a) * v
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_scheduler_config_roundtrip(tmp_path):
    sched = DDIMScheduler(num_train_timesteps=500, prediction_type="v_prediction")
    sched.save_pretrained(str(tmp_path))
    sched2 = DDIMScheduler.from_pretrained(str(tmp_path))
    assert sched2.config.num_train_timesteps == 500
    assert sched2.config.prediction_type == "v_prediction"


def test_unipc_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import UniPCMultistepScheduler

    x0, noise = _x0_and_noise()
    sched = UniPCMultistepScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(20, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 20))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=5e-2)


def test_pndm_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import PNDMScheduler

    x0, noise = _x0_and_noise()
    sched = PNDMScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(30, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 30))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=8e-2)


def test_heun_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import HeunDiscreteScheduler

    x0, noise = _x0_and_noise()
    sched = HeunDiscreteScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(15, sample_shape=SHAPE)
    n_evals = state.num_inference_steps  # 2N-1 model evals
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, n_evals,
                                         scale_input=True))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=0.12)


def test_deis_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import DEISMultistepScheduler

    x0, noise = _x0_and_noise()
    sched = DEISMultistepScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(25, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 25))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=8e-2)


def test_consistency_scheduler():
    from paddlemix_tpu.diffusers.schedulers import CMStochasticIterativeScheduler

    x0, _ = _x0_and_noise()
    sched = CMStochasticIterativeScheduler(sigma_max=20.0)
    state = sched.set_timesteps(3)
    sample = jax.random.normal(jax.random.PRNGKey(1), SHAPE) * sched.init_noise_sigma
    key = jax.random.PRNGKey(0)
    for i in range(3):
        sigma = state.timesteps[i]
        c_skip, c_out = sched.scalings(sigma)
        # oracle consistency fn: model output such that denoised == x0
        # (c_out -> 0 at sigma_min by the CM boundary condition f(x, s_min)=x,
        #  so guard the division; at that point c_skip == 1 anyway)
        model_out = (x0 - c_skip * sample) / jnp.where(c_out == 0, 1.0, c_out)
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, model_out, i, sample, key=sub)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)


def test_dpm_sde_converges():
    from paddlemix_tpu.diffusers.schedulers import DPMSolverSDEScheduler

    x0, noise = _x0_and_noise()
    sched = DPMSolverSDEScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear")
    state = sched.set_timesteps(40)
    sample = noise * sched.init_noise_sigma
    key = jax.random.PRNGKey(0)
    for i in range(40):
        sigma = state.sigmas[i]
        inp = sched.scale_model_input(state, sample, i)
        a = 1.0 / (1.0 + sigma ** 2)
        eps = (inp - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a + 1e-12)
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, eps, i, sample, key=sub)
    assert float(jnp.mean((sample - x0) ** 2)) < 0.2
