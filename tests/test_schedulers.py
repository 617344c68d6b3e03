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


def test_dpmsolver_singlestep_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import DPMSolverSinglestepScheduler

    x0, noise = _x0_and_noise()
    sched = DPMSolverSinglestepScheduler(num_train_timesteps=1000,
                                         beta_schedule="scaled_linear")
    state = sched.set_timesteps(20, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 20))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=6e-2)


def test_dpmsolver_unidiffuser_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import DPMSolverUniDiffuserScheduler

    x0, noise = _x0_and_noise()
    sched = DPMSolverUniDiffuserScheduler(num_train_timesteps=1000,
                                          beta_schedule="scaled_linear")
    state = sched.set_timesteps(20, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 20))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=6e-2)


def _run_edm_loop(sched, state, x0, noise, n):
    """EDM oracle: F such that c_skip*x + c_out*F == x0 exactly."""
    sd = sched.config.sigma_data
    sample = noise * sched.init_noise_sigma

    def body(i, carry):
        sample, state = carry
        sigma = state.sigmas[i]
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        model_out = (x0 - c_skip * sample) / c_out
        return sched.step(state, model_out, i, sample)

    final, _ = jax.lax.fori_loop(0, n, body, (sample, state))
    return final


def test_edm_euler_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import EDMEulerScheduler

    x0, noise = _x0_and_noise()
    sched = EDMEulerScheduler()
    state = sched.set_timesteps(25, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_edm_loop(sched, state, x0, noise, 25))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=2e-3)
    # c_noise timesteps: 0.25 * log(sigma)
    np.testing.assert_allclose(np.asarray(state.timesteps[0]),
                               0.25 * np.log(80.0), atol=1e-4)


def test_edm_dpmsolver_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import EDMDPMSolverMultistepScheduler

    x0, noise = _x0_and_noise()
    sched = EDMDPMSolverMultistepScheduler()
    state = sched.set_timesteps(25, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_edm_loop(sched, state, x0, noise, 25))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=6e-2)


def test_kdpm2_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import KDPM2DiscreteScheduler

    x0, noise = _x0_and_noise()
    sched = KDPM2DiscreteScheduler(num_train_timesteps=1000,
                                   beta_schedule="scaled_linear",
                                   beta_start=0.00085, beta_end=0.012)
    steps = 15
    state = sched.set_timesteps(steps, shape=SHAPE)
    assert state.timesteps.shape[0] == 2 * steps - 1
    sample = noise * sched.init_noise_sigma

    def body(i, carry):
        sample, state = carry
        first = (i % 2) == 0
        sigma_input = jnp.where(first, state.sigmas[i], state.sigmas_interpol[i])
        eps = (sample - x0) / sigma_input  # exact-eps oracle in sigma space
        return sched.step(state, eps, i, sample)

    final, _ = jax.jit(
        lambda: jax.lax.fori_loop(0, 2 * steps - 1, body, (sample, state)))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=5e-2)


def test_kdpm2_ancestral_converges():
    from paddlemix_tpu.diffusers.schedulers import KDPM2AncestralDiscreteScheduler

    x0, noise = _x0_and_noise()
    sched = KDPM2AncestralDiscreteScheduler(num_train_timesteps=1000,
                                            beta_schedule="scaled_linear",
                                            beta_start=0.00085, beta_end=0.012)
    steps = 15
    state = sched.set_timesteps(steps, shape=SHAPE)
    sample = noise * sched.init_noise_sigma
    key = jax.random.PRNGKey(0)
    for i in range(2 * steps - 1):
        first = (i % 2) == 0
        sigma_input = jnp.where(first, state.sigmas[i],
                                state.sigmas_interpol[i - 1])
        eps = (sample - x0) / jnp.maximum(sigma_input, 1e-8)
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, eps, i, sample, key=sub)
    assert float(jnp.mean((sample - x0) ** 2)) < 0.2


def test_lms_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import LMSDiscreteScheduler

    x0, noise = _x0_and_noise()
    sched = LMSDiscreteScheduler(num_train_timesteps=1000,
                                 beta_schedule="scaled_linear",
                                 beta_start=0.00085, beta_end=0.012)
    state = sched.set_timesteps(20, sample_shape=SHAPE)
    final = jax.jit(lambda: _run_vp_loop(sched, state, x0, noise, 20,
                                         scale_input=True))()
    np.testing.assert_allclose(np.asarray(final), np.asarray(x0), atol=5e-2)


def test_lms_karras_runs():
    from paddlemix_tpu.diffusers.schedulers import LMSDiscreteScheduler

    sched = LMSDiscreteScheduler(use_karras_sigmas=True)
    state = sched.set_timesteps(10, sample_shape=SHAPE)
    assert state.coeffs.shape == (10, 4)
    assert float(state.sigmas[0]) > float(state.sigmas[9])


def test_ipndm_converges():
    from paddlemix_tpu.diffusers.schedulers import IPNDMScheduler

    x0, noise = _x0_and_noise()
    sched = IPNDMScheduler()
    n = 50
    state = sched.set_timesteps(n, sample_shape=SHAPE)
    alphas = sched._alphas
    sample = noise
    for i in range(n):
        # oracle: ets target (x - alpha*x0)/beta, inverted through
        # et = x*beta + out*alpha  (skip i=0 where alpha ~ 0: output ignored)
        a, b = alphas[i], state.betas[i]
        et_target = (sample - a * x0) / jnp.maximum(b, 1e-6)
        out = (et_target - sample * b) / jnp.maximum(a, 1e-6)
        sample, state = sched.step(state, out, i, sample)
    assert float(jnp.mean((sample - x0) ** 2)) < 0.05


def test_ddim_inverse_roundtrip():
    from paddlemix_tpu.diffusers.schedulers import DDIMInverseScheduler

    x0, noise = _x0_and_noise()
    sched = DDIMInverseScheduler(num_train_timesteps=1000, clip_sample=False)
    n = 20
    state = sched.set_timesteps(n)
    sample = x0
    for i in range(n):
        sample, state = sched.step(state, noise, i, sample)  # constant-eps model
    # closed form: x_T = sqrt(a_T) x0 + sqrt(1-a_T) eps at the last timestep
    a_T = sched.alphas_cumprod[int(state.timesteps[-1])]
    expected = jnp.sqrt(a_T) * x0 + jnp.sqrt(1 - a_T) * noise
    np.testing.assert_allclose(np.asarray(sample), np.asarray(expected), atol=1e-4)
    # timesteps ascend (image -> noise)
    assert int(state.timesteps[0]) < int(state.timesteps[-1])


def test_dpmsolver_inverse_walks_to_noise():
    from paddlemix_tpu.diffusers.schedulers import DPMSolverMultistepInverseScheduler

    x0, noise = _x0_and_noise()
    sched = DPMSolverMultistepInverseScheduler(num_train_timesteps=1000,
                                               beta_schedule="scaled_linear")
    n = 20
    state = sched.set_timesteps(n, sample_shape=SHAPE)
    # alpha descends from ~1 (clean) toward noisier levels
    assert float(state.alpha_t[0]) > float(state.alpha_t[-1])
    sample = x0
    for i in range(n):
        a, s = state.alpha_t[i], state.sigma_t[i]
        eps = (sample - a * x0) / jnp.maximum(s, 1e-6)
        sample, state = sched.step(state, eps, i, sample)
    # ends at high noise: residual vs x0 large, finite
    assert bool(jnp.all(jnp.isfinite(sample)))
    assert float(jnp.mean((sample - x0) ** 2)) > 0.3


def test_ddim_parallel_batch_step_matches_sequential():
    from paddlemix_tpu.diffusers.schedulers import DDIMParallelScheduler

    x0, noise = _x0_and_noise()
    sched = DDIMParallelScheduler(num_train_timesteps=1000)
    state = sched.set_timesteps(10)
    samples = jnp.stack([noise, noise * 0.5, x0])
    outs = jnp.stack([x0, noise, x0 * 0.2])
    idx = jnp.asarray([0, 3, 7])
    batched = sched.batch_step_no_noise(state, outs, idx, samples)
    for k in range(3):
        seq, _ = sched.step(state, outs[k], idx[k], samples[k])
        np.testing.assert_allclose(np.asarray(batched[k]), np.asarray(seq), atol=1e-6)


def test_ddpm_parallel_batch_step_matches_sequential():
    from paddlemix_tpu.diffusers.schedulers import DDPMParallelScheduler

    x0, noise = _x0_and_noise()
    sched = DDPMParallelScheduler(num_train_timesteps=1000, clip_sample=False)
    state = sched.set_timesteps(10)
    samples = jnp.stack([noise, x0])
    outs = jnp.stack([x0 * 0.1, noise * 0.3])
    idx = jnp.asarray([2, 5])
    batched = sched.batch_step_no_noise(state, outs, idx, samples)
    for k in range(2):
        seq, _ = sched.step(state, outs[k], idx[k], samples[k], key=None)
        np.testing.assert_allclose(np.asarray(batched[k]), np.asarray(seq), atol=1e-6)


def test_repaint_keeps_known_region():
    from paddlemix_tpu.diffusers.schedulers import RePaintScheduler

    x0, noise = _x0_and_noise()
    sched = RePaintScheduler(num_train_timesteps=250)
    state = sched.set_timesteps(25, jump_length=5, jump_n_sample=2)
    assert bool(jnp.any(state.is_undo))  # schedule includes time-travel
    original = x0
    mask = jnp.ones_like(x0)  # everything known
    sample = noise
    key = jax.random.PRNGKey(0)
    for i in range(len(state.timesteps)):
        key, sub = jax.random.split(key)
        if bool(state.is_undo[i]):
            sample, state = sched.undo_step(state, i, sample, sub)
        else:
            t = state.timesteps[i]
            a = sched.alphas_cumprod[t]
            eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
            sample, state = sched.step(state, eps, i, sample, original, mask, sub)
    # fully-known mask: final == original (a_prev -> 1 at t=0)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)


def test_sde_ve_predictor_corrector():
    from paddlemix_tpu.diffusers.schedulers import ScoreSdeVeScheduler

    x0, _ = _x0_and_noise()
    sched = ScoreSdeVeScheduler(sigma_max=10.0, num_train_timesteps=100)
    n = 100
    state = sched.set_timesteps(n)
    key = jax.random.PRNGKey(0)
    sample = jax.random.normal(jax.random.PRNGKey(1), SHAPE) * sched.init_noise_sigma

    x_mean = sample
    for i in range(n):
        sigma = state.sigmas[i]
        for _ in range(sched.config.correct_steps):
            score = -(sample - x0) / sigma ** 2  # exact VE score oracle
            key, sub = jax.random.split(key)
            sample, state = sched.step_correct(state, score, sample, sub)
        score = -(sample - x0) / sigma ** 2
        key, sub = jax.random.split(key)
        sample, x_mean, state = sched.step_pred(state, score, i, sample, sub)
    assert float(jnp.mean((x_mean - x0) ** 2)) < 0.5


def test_unclip_converges_near_x0():
    from paddlemix_tpu.diffusers.schedulers import UnCLIPScheduler

    x0, noise = _x0_and_noise()
    sched = UnCLIPScheduler(num_train_timesteps=1000, clip_sample=False)
    n = 50
    state = sched.set_timesteps(n)
    sample = noise
    key = jax.random.PRNGKey(0)
    for i in range(n):
        t = state.timesteps[i]
        a = sched.alphas_cumprod[t]
        eps = (sample - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, eps, i, sample, key=sub)
    assert float(jnp.mean((sample - x0) ** 2)) < 0.15


def test_unclip_learned_range_split():
    from paddlemix_tpu.diffusers.schedulers import UnCLIPScheduler

    x0, noise = _x0_and_noise()
    sched = UnCLIPScheduler(variance_type="learned_range", clip_sample=False)
    state = sched.set_timesteps(10)
    # model emits concat([eps, variance_logits]) on the channel axis
    out = jnp.concatenate([noise, jnp.zeros_like(noise)], axis=-1)
    prev, _ = sched.step(state, out, 0, noise, key=jax.random.PRNGKey(0))
    assert prev.shape == noise.shape
    assert bool(jnp.all(jnp.isfinite(prev)))


def test_consistency_decoder_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import ConsistencyDecoderScheduler

    x0, noise = _x0_and_noise()
    sched = ConsistencyDecoderScheduler()
    state = sched.set_timesteps(2)
    sd = sched.config.sigma_data
    sample = noise
    key = jax.random.PRNGKey(0)
    for i in range(2):
        t = state.timesteps[i]
        acp = sched.alphas_cumprod[t]
        sigma = jnp.sqrt(1.0 - acp) / jnp.sqrt(acp)
        c_skip = sd ** 2 / (sigma ** 2 + sd ** 2)
        c_out = sigma * sd / jnp.sqrt(sigma ** 2 + sd ** 2)
        model_out = (x0 - c_skip * (sample / jnp.sqrt(acp))) / c_out
        key, sub = jax.random.split(key)
        sample, state = sched.step(state, model_out, i, sample, key=sub)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-4)


def test_karras_ve_recovers_x0():
    from paddlemix_tpu.diffusers.schedulers import KarrasVeScheduler

    x0, noise = _x0_and_noise()
    sched = KarrasVeScheduler()
    n = 30
    state = sched.set_timesteps(n)
    sample = noise * sched.init_noise_sigma
    key = jax.random.PRNGKey(0)
    for i in range(n):
        key, sub = jax.random.split(key)
        sample_hat, sigma_hat = sched.add_noise_to_input(state, sample, i, sub)
        # oracle: model predicts (x0 - x)/sigma so that x0_est == x0 exactly
        model_out = (x0 - sample_hat) / sigma_hat
        prev, derivative, state = sched.step(state, model_out, i, sample_hat,
                                             sigma_hat=sigma_hat)
        sigma_next = state.sigmas[i + 1]
        if float(sigma_next) > 0:
            model_out2 = (x0 - prev) / sigma_next
            prev, state = sched.step_correct(state, model_out2, i, sample_hat,
                                             prev, derivative, sigma_hat=sigma_hat)
        sample = prev
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), atol=1e-3)


def test_scheduler_registry_complete():
    from paddlemix_tpu.diffusers.schedulers import SCHEDULER_REGISTRY

    assert len(SCHEDULER_REGISTRY) >= 31
