"""Value-guided diffusion planning (reference
ppdiffusers/experimental/rl/value_guided_sampling.py): a UNet1D diffuser over
(horizon, state+action) trajectories, guided at every denoise step by the
gradient of a learned value function — jax.grad replaces the reference's
autograd.grad, and the whole plan rollout is one jitted loop."""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class ValueGuidedRLPipeline:
    def __init__(self, value_function, unet, scheduler, env=None,
                 means: Optional[Dict] = None, stds: Optional[Dict] = None,
                 state_dim: Optional[int] = None, action_dim: Optional[int] = None):
        self.value_function = value_function
        self.unet = unet
        self.scheduler = scheduler
        self.env = env
        if env is not None:
            data = env.get_dataset()
            means = {k: np.asarray(v).mean() for k, v in data.items()
                     if hasattr(v, "mean")}
            stds = {k: np.asarray(v).std() for k, v in data.items()
                    if hasattr(v, "std")}
            state_dim = env.observation_space.shape[0]
            action_dim = env.action_space.shape[0]
        self.means = means or {}
        self.stds = stds or {}
        self.state_dim = state_dim
        self.action_dim = action_dim

    def normalize(self, x, key):
        return (x - self.means[key]) / self.stds[key] if key in self.means else x

    def de_normalize(self, x, key):
        return x * self.stds[key] + self.means[key] if key in self.stds else x

    def _reset_x0(self, x, cond_state):
        # pin step 0's state segment to the current observation
        return x.at[:, 0, self.action_dim:].set(cond_state)

    def __call__(self, obs, batch_size: int = 64, planning_horizon: int = 32,
                 n_guide_steps: int = 2, scale: float = 0.1,
                 num_inference_steps: int = 20, seed: int = 0):
        obs = np.asarray(self.normalize(np.asarray(obs, np.float32),
                                        "observations"))
        cond = jnp.broadcast_to(jnp.asarray(obs)[None], (batch_size, obs.shape[-1]))
        shape = (batch_size, planning_horizon, self.state_dim + self.action_dim)

        state = self.scheduler.set_timesteps(num_inference_steps)
        num_steps = num_inference_steps
        x = jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
        x = self._reset_x0(x, cond)

        vf, unet, scheduler = self.value_function, self.unet, self.scheduler
        action_dim = self.action_dim

        def value(params, x, t_in):
            out = vf.module.apply({"params": params}, x, t_in)
            return jnp.sum(out)

        value_grad = jax.grad(value, argnums=1)

        @jax.jit
        def plan(v_params, u_params, x, cond, state):
            def body(i, carry):
                x, state = carry
                t = state.timesteps[i]
                t_in = jnp.broadcast_to(t, (x.shape[0],))

                def guide(_, x):
                    g = value_grad(v_params, x, t_in)
                    g = jnp.where(t < 2, 0.0, g)
                    x = x + scale * g
                    return self._reset_x0(x, cond)

                x = jax.lax.fori_loop(0, n_guide_steps, guide, x)
                pred = unet.module.apply({"params": u_params}, x, t_in)
                x, state = scheduler.step(state, pred, i, x)
                x = self._reset_x0(x, cond)
                return x, state

            out, _ = jax.lax.fori_loop(0, num_steps, body, (x, state))
            return out

        x = plan(vf.params, unet.params, x, cond, state)

        # pick the best trajectory by final value and return its first action
        t0 = jnp.zeros((batch_size,), jnp.float32)
        values = self.value_function.module.apply(
            {"params": self.value_function.params}, x, t0)
        values = jnp.sum(values.reshape(batch_size, -1), axis=-1)
        best = jnp.argmax(values)
        action = np.asarray(x[best, 0, :self.action_dim])
        return self.de_normalize(action, "actions")
