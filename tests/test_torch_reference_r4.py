"""Round-4 torch-reference parity: motion module, SVD spatio-temporal block,
HunyuanDiT block, MAGVIT-v2 LFQ (VERDICT r3 task 9).

Same mechanism as test_torch_reference_diffusion.py: each torch module is an
INDEPENDENT re-implementation of the reference math
(ppdiffusers/ppdiffusers/models/transformer_temporal.py TransformerTemporalModel,
resnet.py:1245 VideoResBlock/SpatioTemporalResBlock,
/root/reference/ppdiffusers/examples/hunyuan_dit models.py:31-119,
video_tokenizer lookup_free_quantization.py:53-200), exported with
diffusers/torch naming, converted through convert_torch_state_dict, and
compared against the flax block — so conversion/layout/activation bugs break
parity against code that shares nothing with the implementation.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from paddlemix_tpu.core.modeling import (
    convert_torch_state_dict,
    unflatten_params,
)

torch.manual_seed(0)


def _to_flax(module: tnn.Module, key_map):
    flat = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    return unflatten_params(convert_torch_state_dict(flat, key_map))


# ----------------------------------------------------------- motion module
class TorchMotionModule(tnn.Module):
    """Reference TransformerTemporalModel math (transformer_temporal.py:42):
    GroupNorm -> proj_in -> frame-axis BasicTransformerBlock(sinusoidal PE,
    double self-attention) -> proj_out + residual."""

    def __init__(self, c, heads, frames, max_len=32):
        super().__init__()
        self.c, self.heads, self.frames, self.max_len = c, heads, frames, max_len
        self.norm = tnn.GroupNorm(8, c, eps=1e-6)
        self.proj_in = tnn.Linear(c, c)
        blk = tnn.ModuleDict()
        blk["norm1"] = tnn.LayerNorm(c)
        blk["attn1"] = self._attn(c)
        blk["norm2"] = tnn.LayerNorm(c)
        blk["attn2"] = self._attn(c)
        blk["norm3"] = tnn.LayerNorm(c)
        ff = tnn.ModuleDict()
        ff["net"] = tnn.ModuleList([
            tnn.ModuleDict({"proj": tnn.Linear(c, c * 8)}),
            tnn.Identity(), tnn.Linear(c * 4, c)])
        blk["ff"] = ff
        self.transformer_blocks = tnn.ModuleList([blk])
        self.proj_out = tnn.Linear(c, c)

    @staticmethod
    def _attn(c):
        m = tnn.ModuleDict()
        m["to_q"] = tnn.Linear(c, c, bias=False)
        m["to_k"] = tnn.Linear(c, c, bias=False)
        m["to_v"] = tnn.Linear(c, c, bias=False)
        m["to_out"] = tnn.ModuleList([tnn.Linear(c, c)])
        return m

    def _pe(self, f):
        pos = torch.arange(self.max_len)[:, None].float()
        div = torch.exp(torch.arange(0, self.c, 2).float()
                        * (-math.log(10000.0) / self.c))
        pe = torch.zeros(self.max_len, self.c)
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        return pe[None, :f]

    def _run_attn(self, m, x):
        b, n, c = x.shape
        hd = c // self.heads
        q = m["to_q"](x).view(b, n, self.heads, hd).transpose(1, 2)
        k = m["to_k"](x).view(b, n, self.heads, hd).transpose(1, 2)
        v = m["to_v"](x).view(b, n, self.heads, hd).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return m["to_out"][0](o.transpose(1, 2).reshape(b, n, c))

    def forward(self, x_nchw):
        bf, c, hh, ww = x_nchw.shape
        f = self.frames
        b = bf // f
        residual = x_nchw
        h = self.norm(x_nchw)
        h = h.permute(0, 2, 3, 1).reshape(b, f, hh * ww, c)
        h = h.permute(0, 2, 1, 3).reshape(b * hh * ww, f, c)
        h = self.proj_in(h)
        blk = self.transformer_blocks[0]
        pe = self._pe(f)
        n = blk["norm1"](h) + pe
        h = h + self._run_attn(blk["attn1"], n)
        n = blk["norm2"](h) + pe
        h = h + self._run_attn(blk["attn2"], n)
        n = blk["norm3"](h)
        hg = blk["ff"]["net"][0]["proj"](n)
        a, g = hg.chunk(2, dim=-1)
        h = h + blk["ff"]["net"][2](a * F.gelu(g))
        h = self.proj_out(h)
        h = h.reshape(b, hh * ww, f, c).permute(0, 2, 1, 3)
        h = h.reshape(b, f, hh, ww, c).reshape(bf, hh, ww, c)
        return h.permute(0, 3, 1, 2) + residual


_MOTION_KEY_MAP = (
    (r"transformer_blocks\.(\d+)\.", r"transformer_blocks_\1."),
    (r"\.to_out\.0\.", r".to_out."),
    (r"\.ff\.net\.0\.", r".ff.net_0."),
    (r"\.ff\.net\.2", r".ff.net_2"),
    (r"(norm[0-9]*)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


def test_motion_module_matches_torch():
    from paddlemix_tpu.diffusers.models.unet_motion import MotionModule

    c, heads, frames = 32, 4, 4
    tm = TorchMotionModule(c, heads, frames).eval()
    params = _to_flax(tm, _MOTION_KEY_MAP)
    fm = MotionModule(num_heads=heads, num_frames=frames, groups=8)
    x = np.random.RandomState(0).randn(2 * frames, 6, 6, c).astype(np.float32)
    got = fm.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-3)


# --------------------------------------------- SVD spatio-temporal resblock
class TorchSpatioTemporalResBlock(tnn.Module):
    """Reference resnet.py:1245 SpatioTemporalResBlock: spatial
    ResnetBlock2D -> temporal (3,1,1)-conv resnet -> AlphaBlender
    (learned_with_images)."""

    def __init__(self, c, frames, groups=8):
        super().__init__()
        self.frames = frames
        sp = tnn.ModuleDict()
        sp["norm1"] = tnn.GroupNorm(groups, c, eps=1e-6)
        sp["conv1"] = tnn.Conv2d(c, c, 3, padding=1)
        sp["time_emb_proj"] = tnn.Linear(16, c)
        sp["norm2"] = tnn.GroupNorm(groups, c, eps=1e-6)
        sp["conv2"] = tnn.Conv2d(c, c, 3, padding=1)
        self.spatial_res_block = sp
        tp = tnn.ModuleDict()
        tp["norm1"] = tnn.GroupNorm(groups, c, eps=1e-6)
        tp["conv1"] = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        tp["time_emb_proj"] = tnn.Linear(16, c)
        tp["norm2"] = tnn.GroupNorm(groups, c, eps=1e-6)
        tp["conv2"] = tnn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0))
        self.temporal_res_block = tp
        self.register_parameter(
            "mix_factor", tnn.Parameter(torch.tensor([0.5])))

    def _spatial(self, x, temb):
        sp = self.spatial_res_block
        h = sp["conv1"](F.silu(sp["norm1"](x)))
        h = h + sp["time_emb_proj"](F.silu(temb))[:, :, None, None]
        h = sp["conv2"](F.silu(sp["norm2"](h)))
        return x + h

    def _temporal(self, x, temb):
        # x: (B, C, F, H, W); temb: (B, F, D)
        tp = self.temporal_res_block
        h = tp["conv1"](F.silu(tp["norm1"](x)))
        t = tp["time_emb_proj"](F.silu(temb))          # (B, F, C)
        h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = tp["conv2"](F.silu(tp["norm2"](h)))
        return x + h

    def forward(self, x, temb, image_only_indicator):
        # x: (B*F, C, H, W)
        f = self.frames
        x = self._spatial(x, temb)
        bf, c, hh, ww = x.shape
        b = bf // f
        vid = x.reshape(b, f, c, hh, ww).permute(0, 2, 1, 3, 4)
        mixed = self._temporal(vid, temb.reshape(b, f, -1))
        alpha = torch.sigmoid(self.mix_factor)
        alpha = torch.where(image_only_indicator.bool(),
                            torch.ones(1, 1), alpha[..., None])
        alpha = alpha[:, None, :, None, None]          # (B, 1, F, 1, 1)
        out = alpha * vid + (1.0 - alpha) * mixed
        return out.permute(0, 2, 1, 3, 4).reshape(bf, c, hh, ww)


_SVD_KEY_MAP = (
    (r"^mix_factor$", r"time_mixer.mix_factor"),
    (r"(norm[0-9]*)\.weight$", r"\1.scale"),
    (r"\.weight$", r".kernel"),
)


def test_svd_spatio_temporal_block_matches_torch():
    from paddlemix_tpu.diffusers.models.unet_spatio_temporal import (
        SpatioTemporalResBlock,
    )

    c, frames = 32, 4
    tm = TorchSpatioTemporalResBlock(c, frames).eval()
    params = _to_flax(tm, _SVD_KEY_MAP)
    fm = SpatioTemporalResBlock(num_frames=frames, groups=8)
    rs = np.random.RandomState(1)
    x = rs.randn(1 * frames, 6, 6, c).astype(np.float32)
    temb = rs.randn(1 * frames, 16).astype(np.float32)
    ind = np.zeros((1, frames), np.float32)  # video rows: learned mix
    got = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb),
                   jnp.asarray(ind))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                 torch.from_numpy(temb), torch.from_numpy(ind))
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4, rtol=1e-3)


# ------------------------------------------------------------ HunyuanDiT
class TorchHunyuanBlock(tnn.Module):
    """Reference hunyuan_dit models.py:31-119: skip-norm+linear, shift-only
    modulation, qk-RMSNorm self-attn with 2D rope, cross-attn, gelu-tanh
    MLP."""

    def __init__(self, d, heads, ctx_dim, mlp_ratio=4.0):
        super().__init__()
        self.d, self.heads = d, heads
        self.skip_norm = tnn.LayerNorm(2 * d, eps=1e-6)
        self.skip_linear = tnn.Linear(2 * d, d)
        self.modulation = tnn.Linear(d, d)
        self.norm1 = tnn.LayerNorm(d, eps=1e-6)
        self.attn1 = tnn.ModuleDict({
            "qkv": tnn.Linear(d, 3 * d),
            "q_norm": tnn.LayerNorm(d // heads, eps=1e-6,
                                    elementwise_affine=True, bias=False),
            "k_norm": tnn.LayerNorm(d // heads, eps=1e-6,
                                    elementwise_affine=True, bias=False),
            "out_proj": tnn.Linear(d, d)})
        self.norm3 = tnn.LayerNorm(d, eps=1e-6)
        self.attn2 = tnn.ModuleDict({
            "q_proj": tnn.Linear(d, d),
            "kv_proj": tnn.Linear(ctx_dim, 2 * d),
            "q_norm": tnn.LayerNorm(d // heads, eps=1e-6,
                                    elementwise_affine=True, bias=False),
            "k_norm": tnn.LayerNorm(d // heads, eps=1e-6,
                                    elementwise_affine=True, bias=False),
            "out_proj": tnn.Linear(d, d)})
        self.norm2 = tnn.LayerNorm(d, eps=1e-6)
        self.fc1 = tnn.Linear(d, int(d * mlp_ratio))
        self.fc2 = tnn.Linear(int(d * mlp_ratio), d)

    @staticmethod
    def _rms(x, scale):
        y = x.float()
        y = y * torch.rsqrt(y.pow(2).mean(-1, keepdim=True) + 1e-6)
        return y * scale

    @staticmethod
    def _rope(x, cos, sin):
        # x: (B, H, N, Dh); cos/sin: (N, Dh//2)
        d2 = x.shape[-1] // 2
        x1, x2 = x[..., :d2], x[..., d2:]
        c = cos[None, None]
        s = sin[None, None]
        return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)

    def _attn(self, m, q, k, v, rope=None):
        b, n, d = q.shape
        hd = d // self.heads
        m_len = k.shape[1]
        qh = q.view(b, n, self.heads, hd).transpose(1, 2)
        kh = k.view(b, m_len, self.heads, hd).transpose(1, 2)
        vh = v.view(b, m_len, self.heads, hd).transpose(1, 2)
        qh = self._rms(qh, m["q_norm"].weight)
        kh = self._rms(kh, m["k_norm"].weight)
        if rope is not None:
            cos, sin = rope
            qh = self._rope(qh, cos, sin)
            kh = self._rope(kh, cos, sin)
        o = F.scaled_dot_product_attention(qh.float(), kh.float(), vh.float())
        return m["out_proj"](o.transpose(1, 2).reshape(b, n, d))

    def forward(self, x, c, text, rope, skip):
        cat = torch.cat([x, skip], dim=-1)
        x = self.skip_linear(self.skip_norm(cat))
        shift = self.modulation(F.silu(c))
        h = self.norm1(x) + shift[:, None]
        qkv = self.attn1["qkv"](h)
        q, k, v = qkv.chunk(3, dim=-1)
        x = x + self._attn(self.attn1, q, k, v, rope)
        h = self.norm3(x)
        q = self.attn2["q_proj"](h)
        kv = self.attn2["kv_proj"](text)
        k, v = kv.chunk(2, dim=-1)
        x = x + self._attn(self.attn2, q, k, v)
        h = self.norm2(x)
        return x + self.fc2(F.gelu(self.fc1(h), approximate="tanh"))


_HUNYUAN_KEY_MAP = (
    (r"(q_norm|k_norm)\.weight$", r"\1.scale"),
    (r"(norm[0-9]*)\.weight$", r"\1.scale"),
    (r"skip_norm\.weight$", r"skip_norm.scale"),
    (r"\.weight$", r".kernel"),
    (r"^modulation\.kernel$", r"modulation.kernel"),
)


def test_hunyuan_dit_block_matches_torch():
    from paddlemix_tpu.diffusers.models.hunyuan_dit import (
        HunyuanDiTBlock,
        HunyuanDiTConfig,
        get_2d_rotary_pos_embed,
    )

    d, heads, ctx = 32, 4, 24
    cfg = HunyuanDiTConfig(hidden_size=d, num_heads=heads, mlp_ratio=4.0)
    tm = TorchHunyuanBlock(d, heads, ctx).eval()
    # the flax modulation Dense is zero-init; give torch the same weights
    params = _to_flax(tm, _HUNYUAN_KEY_MAP)
    fm = HunyuanDiTBlock(cfg, skip=True)
    rs = np.random.RandomState(2)
    n_tok = 16  # 4x4 grid
    x = rs.randn(2, n_tok, d).astype(np.float32)
    cvec = rs.randn(2, d).astype(np.float32)
    text = rs.randn(2, 7, ctx).astype(np.float32)
    skip = rs.randn(2, n_tok, d).astype(np.float32)
    cos, sin = get_2d_rotary_pos_embed(d // heads, 4, 4)
    got = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(cvec),
                   jnp.asarray(text), (cos, sin), skip=jnp.asarray(skip))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(cvec),
                 torch.from_numpy(text),
                 (torch.from_numpy(np.asarray(cos)),
                  torch.from_numpy(np.asarray(sin))),
                 torch.from_numpy(skip))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-4, rtol=1e-3)


# ------------------------------------------------------------ MAGVIT-v2 LFQ
def test_lfq_encode_decode_matches_torch():
    """Reference lookup_free_quantization.py:53-200: quantized = sign(x),
    index = big-endian sign bits, straight-through estimator. The torch twin
    re-derives indices and the decode (index -> codes) independently."""
    from paddlemix_tpu.diffusers.models.magvit2 import LFQ

    dim = 16  # codebook 2^16... keep small: use codebook_dim = 6
    codebook_size = 64  # 2^6
    lfq = LFQ(codebook_size=codebook_size, dim=dim)
    rs = np.random.RandomState(3)
    z = rs.randn(2, 5, dim).astype(np.float32)
    params = lfq.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    out, indices, aux, _ = lfq.apply({"params": params}, jnp.asarray(z))

    # torch twin using the SAME projections (converted)
    win = np.asarray(params["project_in"]["kernel"])
    bin_ = np.asarray(params["project_in"]["bias"])
    wout = np.asarray(params["project_out"]["kernel"])
    bout = np.asarray(params["project_out"]["bias"])
    zt = torch.from_numpy(z)
    xt = zt @ torch.from_numpy(win) + torch.from_numpy(bin_)
    qt = torch.where(xt > 0, torch.tensor(1.0), torch.tensor(-1.0))
    d = int(math.log2(codebook_size))
    mask = torch.pow(2, torch.arange(d - 1, -1, -1)).long()
    idx_t = ((qt > 0).long() * mask).sum(-1)
    out_t = qt @ torch.from_numpy(wout) + torch.from_numpy(bout)

    np.testing.assert_array_equal(np.asarray(indices), idx_t.numpy())
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(),
                               atol=1e-5, rtol=1e-5)
    # decode round-trip: indices -> codes -> must equal quantized signs
    bits = (idx_t[..., None] // mask) % 2
    codes = bits.float() * 2.0 - 1.0
    np.testing.assert_allclose(codes.numpy(), qt.numpy(), atol=0)
