"""Independent torch re-implementations of the diffusion trunk blocks,
asserting parity THROUGH the checkpoint conversion path (VERDICT r2 item 5).

Each torch module is written from the reference's math
(ppdiffusers/ppdiffusers/models/resnet.py ResnetBlock2D,
attention.py BasicTransformerBlock, vae.py Decoder mid-block,
transformer_sd3.py JointTransformerBlock) with diffusers/torch parameter
naming, randomly initialized, exported as a torch-style state dict, converted
with the SAME key maps the full models use, and compared against the flax
block output. This is regression protection the self-generated goldens can't
give: a silent conversion/layout/activation bug shows up as a parity break
against code that shares nothing with the implementation.

Scheduler steps are cross-pinned against hand-computed closed-form updates
(DDIM Eq.12, DPM-Solver++ 2M, Euler, Euler-ancestral, DDPM posterior)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from paddlemix_tpu.core.modeling import convert_torch_state_dict, unflatten_params
from paddlemix_tpu.diffusers.models.attention import (
    AttentionBlock2D,
    BasicTransformerBlock,
)
from paddlemix_tpu.diffusers.models.resnet import ResnetBlock2D
from paddlemix_tpu.diffusers.models.transformer_sd3 import JointTransformerBlock
from paddlemix_tpu.diffusers.models.unet_2d_condition import _UNET_KEY_MAP
from paddlemix_tpu.diffusers.models.autoencoder_kl import _VAE_KEY_MAP

torch.manual_seed(0)


def _to_flax_params(module: tnn.Module, key_map):
    flat = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return unflatten_params(convert_torch_state_dict(flat, key_map))


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def _assert_close(flax_out_nhwc, torch_out_nchw, tol=2e-5):
    ref = np.transpose(torch_out_nchw.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(flax_out_nhwc), ref,
                               rtol=tol * 50, atol=tol * max(
                                   1.0, float(np.abs(ref).max())))


# ------------------------------------------------------------- ResnetBlock2D
class TorchResnetBlock2D(tnn.Module):
    """Reference math: ppdiffusers/models/resnet.py ResnetBlock2D (norm1 ->
    silu -> conv1 -> +time_proj(silu(temb)) -> norm2 -> silu -> conv2 ->
    +shortcut)."""

    def __init__(self, c_in, c_out, temb_dim, groups=4):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, c_in, eps=1e-5)
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, c_out)
        self.norm2 = tnn.GroupNorm(groups, c_out, eps=1e-5)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, padding=1)
        self.conv_shortcut = tnn.Conv2d(c_in, c_out, 1) if c_in != c_out else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


def test_resnet_block_matches_torch():
    c_in, c_out, temb_dim = 8, 16, 12
    tm = TorchResnetBlock2D(c_in, c_out, temb_dim)
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.2
    params = _to_flax_params(tm, _UNET_KEY_MAP)
    x = np.random.RandomState(0).randn(2, 6, 6, c_in).astype(np.float32)
    temb = np.random.RandomState(1).randn(2, temb_dim).astype(np.float32)
    fb = ResnetBlock2D(out_channels=c_out, groups=4)
    out = fb.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb))
    ref = tm(_nchw(x), torch.from_numpy(temb))
    _assert_close(out, ref)


# ------------------------------------------------- BasicTransformerBlock
class TorchAttention(tnn.Module):
    def __init__(self, d, heads, cross_dim=None):
        super().__init__()
        self.heads = heads
        self.to_q = tnn.Linear(d, d, bias=False)
        self.to_k = tnn.Linear(cross_dim or d, d, bias=False)
        self.to_v = tnn.Linear(cross_dim or d, d, bias=False)
        self.to_out = tnn.ModuleList([tnn.Linear(d, d)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, n, d = x.shape
        hd = d // self.heads
        q = self.to_q(x).view(b, n, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], self.heads, hd).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, d)
        return self.to_out[0](out)


class TorchBasicTransformerBlock(tnn.Module):
    """Reference: ppdiffusers/models/attention.py BasicTransformerBlock
    (self-attn -> cross-attn -> GEGLU ff, pre-LN residuals; GEGLU gate is
    EXACT gelu per activations.py:98-99)."""

    def __init__(self, d, heads, cross_dim):
        super().__init__()
        self.norm1 = tnn.LayerNorm(d)
        self.attn1 = TorchAttention(d, heads)
        self.norm2 = tnn.LayerNorm(d)
        self.attn2 = TorchAttention(d, heads, cross_dim)
        self.norm3 = tnn.LayerNorm(d)
        self.ff = tnn.ModuleDict({})
        # diffusers naming: ff.net.0.proj (GEGLU), ff.net.2 (out)
        self.ff_proj = tnn.Linear(d, d * 8)
        self.ff_out = tnn.Linear(d * 4, d)

    def state_dict(self, *a, **kw):
        sd = dict(super().state_dict(*a, **kw))
        for k in list(sd):
            nk = k.replace("ff_proj.", "ff.net.0.proj.").replace(
                "ff_out.", "ff.net.2.")
            sd[nk] = sd.pop(k)
        return sd

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        h, gate = self.ff_proj(self.norm3(x)).chunk(2, dim=-1)
        return x + self.ff_out(h * F.gelu(gate))


def test_basic_transformer_block_matches_torch():
    d, heads, cross = 16, 2, 12
    tm = TorchBasicTransformerBlock(d, heads, cross)
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.1
    params = _to_flax_params(tm, _UNET_KEY_MAP)
    x = np.random.RandomState(0).randn(2, 9, d).astype(np.float32)
    ctx = np.random.RandomState(1).randn(2, 5, cross).astype(np.float32)
    fb = BasicTransformerBlock(num_heads=heads, head_dim=d // heads)
    out = fb.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    ref = tm(torch.from_numpy(x), torch.from_numpy(ctx)).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=2e-4)


# ------------------------------------------------------- VAE decoder block
class TorchVAEAttention(tnn.Module):
    """Reference: ppdiffusers/models/vae.py Decoder mid-block Attention
    (group_norm -> single-head qkv over flattened spatial -> to_out ->
    +residual)."""

    def __init__(self, c, groups=4):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, c, eps=1e-6)
        self.to_q = tnn.Linear(c, c)
        self.to_k = tnn.Linear(c, c)
        self.to_v = tnn.Linear(c, c)
        self.to_out = tnn.Linear(c, c)

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        hN = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hN), self.to_k(hN), self.to_v(hN)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        out = self.to_out(attn @ v)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


def test_vae_attention_block_matches_torch():
    c = 16
    tm = TorchVAEAttention(c)
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.2
    params = _to_flax_params(tm, _VAE_KEY_MAP)
    x = np.random.RandomState(0).randn(1, 4, 4, c).astype(np.float32)
    fb = AttentionBlock2D(groups=4)
    out = fb.apply({"params": params}, jnp.asarray(x))
    ref = tm(_nchw(x))
    _assert_close(out, ref, tol=1e-4)


# --------------------------------------------------------- SD3 MM-DiT block
class TorchJointBlock(tnn.Module):
    """Reference: ppdiffusers/models/transformer_sd3.py JointTransformerBlock:
    adaLN-zero dual-stream joint attention + gelu-tanh FF."""

    def __init__(self, d, heads):
        super().__init__()
        self.d, self.heads = d, heads
        mk = tnn.Linear
        self.norm1_linear = mk(d, 6 * d)
        self.norm1_context_linear = mk(d, 6 * d)
        self.attn_to_q = mk(d, d)
        self.attn_to_k = mk(d, d)
        self.attn_to_v = mk(d, d)
        self.attn_add_q_proj = mk(d, d)
        self.attn_add_k_proj = mk(d, d)
        self.attn_add_v_proj = mk(d, d)
        self.attn_to_out = mk(d, d)
        self.attn_to_add_out = mk(d, d)
        self.ff_fc1 = mk(d, 4 * d)
        self.ff_fc2 = mk(4 * d, d)
        self.ff_context_fc1 = mk(d, 4 * d)
        self.ff_context_fc2 = mk(4 * d, d)

    def state_dict(self, *a, **kw):
        ren = {"norm1_linear.": "norm1.linear.",
               "norm1_context_linear.": "norm1_context.linear.",
               "attn_to_q.": "attn.to_q.", "attn_to_k.": "attn.to_k.",
               "attn_to_v.": "attn.to_v.",
               "attn_add_q_proj.": "attn.add_q_proj.",
               "attn_add_k_proj.": "attn.add_k_proj.",
               "attn_add_v_proj.": "attn.add_v_proj.",
               "attn_to_out.": "attn.to_out.0.",
               "attn_to_add_out.": "attn.to_add_out.",
               "ff_fc1.": "ff.net.0.proj.", "ff_fc2.": "ff.net.2.",
               "ff_context_fc1.": "ff_context.net.0.proj.",
               "ff_context_fc2.": "ff_context.net.2."}
        sd = dict(super().state_dict(*a, **kw))
        out = {}
        for k, v in sd.items():
            for old, new in ren.items():
                if k.startswith(old):
                    k = new + k[len(old):]
                    break
            out[k] = v
        return out

    @staticmethod
    def _modln(x, shift, scale):
        h = F.layer_norm(x, (x.shape[-1],))
        return h * (1 + scale[:, None]) + shift[:, None]

    def forward(self, x, ctx, temb):
        d, heads = self.d, self.heads
        hd = d // heads
        e = F.silu(temb)
        sx, scx, gx, sx2, scx2, gx2 = self.norm1_linear(e).chunk(6, dim=-1)
        sc, scc, gc, sc2, scc2, gc2 = self.norm1_context_linear(e).chunk(6, dim=-1)
        hx = self._modln(x, sx, scx)
        hc = self._modln(ctx, sc, scc)
        b, nx, _ = x.shape
        nc = ctx.shape[1]

        def split(t, n):
            return t.view(b, n, heads, hd).transpose(1, 2)

        q = torch.cat([split(self.attn_add_q_proj(hc), nc),
                       split(self.attn_to_q(hx), nx)], dim=2)
        k = torch.cat([split(self.attn_add_k_proj(hc), nc),
                       split(self.attn_to_k(hx), nx)], dim=2)
        v = torch.cat([split(self.attn_add_v_proj(hc), nc),
                       split(self.attn_to_v(hx), nx)], dim=2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hd), dim=-1) @ v
        attn = attn.transpose(1, 2).reshape(b, nc + nx, d)
        attn_c, attn_x = attn[:, :nc], attn[:, nc:]

        x = x + gx[:, None] * self.attn_to_out(attn_x)
        hx2 = self._modln(x, sx2, scx2)
        x = x + gx2[:, None] * self.ff_fc2(F.gelu(self.ff_fc1(hx2), approximate="tanh"))

        ctx = ctx + gc[:, None] * self.attn_to_add_out(attn_c)
        hc2 = self._modln(ctx, sc2, scc2)
        ctx = ctx + gc2[:, None] * self.ff_context_fc2(
            F.gelu(self.ff_context_fc1(hc2), approximate="tanh"))
        return x, ctx


def test_sd3_joint_block_matches_torch():
    from paddlemix_tpu.diffusers.models.transformer_sd3 import SD3Transformer2DModel

    d, heads = 16, 2
    tm = TorchJointBlock(d, heads)
    for p in tm.parameters():
        p.data = torch.randn_like(p) * 0.1
    # run the block-subtree state dict through the FULL model conversion
    # (qkv fusion + key map), exactly what from_pretrained does
    flat = {"transformer_blocks.0." + k: v.detach().numpy()
            for k, v in tm.state_dict().items()}
    conv = SD3Transformer2DModel.convert_foreign_state_dict(flat, None)
    prefix = "transformer_blocks_0."
    params = unflatten_params({k[len(prefix):]: v for k, v in conv.items()})
    x = np.random.RandomState(0).randn(2, 6, d).astype(np.float32)
    ctx = np.random.RandomState(1).randn(2, 4, d).astype(np.float32)
    temb = np.random.RandomState(2).randn(2, d).astype(np.float32)
    fb = JointTransformerBlock(num_heads=heads, head_dim=d // heads)
    ox, oc = fb.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx),
                      jnp.asarray(temb))
    rx, rc = tm(torch.from_numpy(x), torch.from_numpy(ctx), torch.from_numpy(temb))
    np.testing.assert_allclose(np.asarray(ox), rx.detach().numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(oc), rc.detach().numpy(),
                               rtol=1e-3, atol=5e-4)


# ------------------------------------------------------ scheduler cross-pins
def _betas(n=1000, start=0.00085, end=0.012):
    return np.linspace(start ** 0.5, end ** 0.5, n, dtype=np.float64) ** 2


def test_ddim_step_matches_eq12():
    """DDIM Eq.12 (eta=0): x_{t-1} = sqrt(a_prev)*x0_pred +
    sqrt(1-a_prev)*eps, x0_pred = (x_t - sqrt(1-a_t) eps)/sqrt(a_t)."""
    from paddlemix_tpu.diffusers.schedulers import DDIMScheduler

    sch = DDIMScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear",
                        beta_start=0.00085, beta_end=0.012,
                        timestep_spacing="leading", set_alpha_to_one=False)
    state = sch.set_timesteps(10)
    x = np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32)
    eps = np.random.RandomState(1).randn(1, 4, 4, 3).astype(np.float32)
    i = 3
    out, _ = sch.step(state, jnp.asarray(eps), i, jnp.asarray(x))

    alphas = np.cumprod(1 - _betas())
    t = int(state.timesteps[i])
    t_prev = t - 1000 // 10
    a_t, a_prev = alphas[t], alphas[t_prev] if t_prev >= 0 else alphas[0]
    x0 = (x - math.sqrt(1 - a_t) * eps) / math.sqrt(a_t)
    ref = math.sqrt(a_prev) * x0 + math.sqrt(1 - a_prev) * eps
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_euler_step_matches_formula():
    """Euler discrete: x_{i+1} = x + (sigma_{i+1}-sigma_i) * d, with
    d = (x - x0_pred)/sigma and x0_pred = x - sigma*eps (epsilon pred)."""
    from paddlemix_tpu.diffusers.schedulers import EulerDiscreteScheduler

    sch = EulerDiscreteScheduler(num_train_timesteps=1000,
                                 beta_schedule="scaled_linear",
                                 beta_start=0.00085, beta_end=0.012,
                                 timestep_spacing="leading")
    state = sch.set_timesteps(10)
    x = np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32)
    eps = np.random.RandomState(1).randn(1, 4, 4, 3).astype(np.float32)
    i = 2
    out, _ = sch.step(state, jnp.asarray(eps), i, jnp.asarray(x))
    sig = np.asarray(state.sigmas)
    ref = x + (sig[i + 1] - sig[i]) * eps  # d == eps for epsilon prediction
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_euler_ancestral_step_matches_formula():
    from paddlemix_tpu.diffusers.schedulers import EulerAncestralDiscreteScheduler

    sch = EulerAncestralDiscreteScheduler(
        num_train_timesteps=1000, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, timestep_spacing="leading")
    state = sch.set_timesteps(10)
    x = np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32)
    eps = np.random.RandomState(1).randn(1, 4, 4, 3).astype(np.float32)
    i = 2
    key = jax.random.PRNGKey(7)
    out, _ = sch.step(state, jnp.asarray(eps), i, jnp.asarray(x), key=key)
    sig = np.asarray(state.sigmas, np.float64)
    s, s_next = sig[i], sig[i + 1]
    sigma_up = min(s_next, math.sqrt(
        (s_next ** 2 * (s ** 2 - s_next ** 2)) / s ** 2))
    sigma_down = math.sqrt(s_next ** 2 - sigma_up ** 2)
    noise = np.asarray(jax.random.normal(key, x.shape, jnp.float32))
    ref = x + (sigma_down - s) * eps + sigma_up * noise
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_ddpm_posterior_matches_formula():
    from paddlemix_tpu.diffusers.schedulers import DDPMScheduler

    sch = DDPMScheduler(num_train_timesteps=1000, beta_schedule="scaled_linear",
                        beta_start=0.00085, beta_end=0.012, clip_sample=False)
    state = sch.set_timesteps(10)
    x = np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32)
    eps = np.random.RandomState(1).randn(1, 4, 4, 3).astype(np.float32)
    i = 4
    key = jax.random.PRNGKey(3)
    out, _ = sch.step(state, jnp.asarray(eps), i, jnp.asarray(x), key=key)

    betas = _betas()
    alphas = 1 - betas
    abar = np.cumprod(alphas)
    t = int(state.timesteps[i])
    t_prev = int(state.timesteps[i + 1]) if i + 1 < 10 else -1
    a_t, a_prev = abar[t], abar[t_prev] if t_prev >= 0 else 1.0
    beta_eff = 1 - a_t / a_prev
    x0 = (x - math.sqrt(1 - a_t) * eps) / math.sqrt(a_t)
    x0 = np.asarray(x0, np.float64)
    mean = (math.sqrt(a_prev) * beta_eff / (1 - a_t)) * x0 \
        + (math.sqrt(a_t / a_prev) * (1 - a_prev) / (1 - a_t)) * x
    var = (1 - a_prev) / (1 - a_t) * beta_eff
    noise = np.asarray(jax.random.normal(key, x.shape, jnp.float32))
    ref = mean + math.sqrt(max(var, 1e-20)) * noise
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_dpmpp_2m_step_matches_formula():
    """DPM-Solver++(2M) data-prediction update (Lu et al. 2022, Eq. in
    scheduling_dpmsolver_multistep.py multistep_dpm_solver_second_order):
    x_{i+1} = (s_{i+1}/s_i) x - a_{i+1}(e^{-h}-1)[(1+1/2r)D0 - (1/2r)D1]."""
    from paddlemix_tpu.diffusers.schedulers import DPMSolverMultistepScheduler

    sch = DPMSolverMultistepScheduler(
        num_train_timesteps=1000, beta_schedule="scaled_linear",
        beta_start=0.00085, beta_end=0.012, timestep_spacing="leading",
        algorithm_type="dpmsolver++", solver_order=2)
    state = sch.set_timesteps(10)
    x = np.random.RandomState(0).randn(1, 4, 4, 3).astype(np.float32)
    eps1 = np.random.RandomState(1).randn(1, 4, 4, 3).astype(np.float32) * 0.3
    eps2 = np.random.RandomState(2).randn(1, 4, 4, 3).astype(np.float32) * 0.3

    x1, state = sch.step(state, jnp.asarray(eps1), 0, jnp.asarray(x))
    out, _ = sch.step(state, jnp.asarray(eps2), 1, x1)

    # VP parametrization from first principles: alpha=sqrt(abar),
    # sigma=sqrt(1-abar), lambda=log(alpha/sigma) at the spaced timesteps
    abar = np.cumprod(1 - _betas())
    ts = np.asarray(state.timesteps)
    a = np.sqrt(abar[ts[:3]])
    s = np.sqrt(1 - abar[ts[:3]])
    lam = np.log(a / s)

    x0_0 = (x - s[0] * eps1) / a[0]
    x1_ref = (s[1] / s[0]) * x - a[1] * math.expm1(-(lam[1] - lam[0])) * x0_0
    x0_1 = (x1_ref - s[1] * eps2) / a[1]
    h = lam[2] - lam[1]
    r = (lam[1] - lam[0]) / h
    d1 = (x0_1 - x0_0) / r
    x2_ref = (s[2] / s[1]) * x1_ref - a[2] * math.expm1(-h) * x0_1 \
        - 0.5 * a[2] * math.expm1(-h) * d1
    np.testing.assert_allclose(np.asarray(x1), x1_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), x2_ref, rtol=1e-3, atol=1e-4)
