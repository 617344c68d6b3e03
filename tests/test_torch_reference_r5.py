"""Round-5 torch-reference parity for the previously skeleton-verified VLM
families (VERDICT r4 task 3): each torch module here is an INDEPENDENT
re-implementation of the reference math, exported with the checkpoint's key
naming, converted through convert_foreign_state_dict / convert_torch_state_dict,
and compared against the flax implementation — so a transposed projection or a
misplaced norm breaks the test against code that shares nothing with the
implementation.

Covered: Qwen-VL ViT-bigG tower + Resampler (reference
paddlemix/models/qwen_vl/qwen_vit.py:267, visual.py:73-193).
"""

import math

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from paddlemix_tpu.core.modeling import unflatten_params

torch.manual_seed(0)


# ------------------------------------------------------- Qwen-VL ViT tower
class TorchQwenVisual(tnn.Module):
    """Reference qwen_vit.py VisionTransformer + visual.py Vision/Resampler:
    biasless conv patch embed (no cls), bicubic-interpolated abs pos, ln_pre,
    pre-LN blocks with fused per-head-interleaved in_proj, then a Resampler
    whose query/key both carry 2D sincos pos embeds, ln_post, @ proj."""

    def __init__(self, width, layers, heads, mlp_ratio, out_dim, patch,
                 pos_size, n_queries, nh_pool):
        super().__init__()
        self.heads, self.nh_pool = heads, nh_pool
        self.conv1 = tnn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.positional_embedding = tnn.Parameter(
            torch.randn(pos_size * pos_size, width) * width ** -0.5)
        self.ln_pre = tnn.LayerNorm(width, eps=1e-6)
        blocks = []
        for _ in range(layers):
            blk = tnn.ModuleDict({
                "ln_1": tnn.LayerNorm(width, eps=1e-6),
                "ln_2": tnn.LayerNorm(width, eps=1e-6)})
            blk["attn"] = tnn.ModuleDict({
                "in_proj": tnn.Linear(width, 3 * width),
                "out_proj": tnn.Linear(width, width)})
            blk["mlp"] = tnn.ModuleDict({
                "c_fc": tnn.Linear(width, int(width * mlp_ratio)),
                "c_proj": tnn.Linear(int(width * mlp_ratio), width)})
            blocks.append(blk)
        self.resblocks = tnn.ModuleList(blocks)
        grid = int(math.sqrt(n_queries))
        from paddlemix_tpu.models.qwen_vl import get_2d_sincos_pos_embed

        pool = tnn.ModuleDict({
            "kv_proj": tnn.Linear(width, out_dim, bias=False),
            "ln_q": tnn.LayerNorm(out_dim, eps=1e-6),
            "ln_kv": tnn.LayerNorm(out_dim, eps=1e-6)})
        pool["attn"] = tnn.ModuleDict({
            "out_proj": tnn.Linear(out_dim, out_dim)})
        self.attn_pool = pool
        # torch nn.MultiheadAttention-style packed qkv
        self.attn_pool.attn.in_proj_weight = tnn.Parameter(
            torch.randn(3 * out_dim, out_dim) * 0.05)
        self.attn_pool.attn.in_proj_bias = tnn.Parameter(
            torch.randn(3 * out_dim) * 0.02)
        self.attn_pool.query = tnn.Parameter(
            torch.randn(grid * grid, out_dim) * 0.02)
        self.attn_pool.pos_embed = tnn.Parameter(
            torch.from_numpy(get_2d_sincos_pos_embed(out_dim, grid)))
        self.ln_post = tnn.LayerNorm(out_dim, eps=1e-6)
        self.proj = tnn.Parameter(torch.randn(out_dim, out_dim) * out_dim ** -0.5)

    @staticmethod
    def _interp(pos, n):
        src = int(math.sqrt(pos.shape[0]))
        tgt = int(math.sqrt(n))
        if src == tgt:
            return pos
        x = pos.reshape(1, src, src, -1).permute(0, 3, 1, 2)
        x = F.interpolate(x, size=(tgt, tgt), mode="bicubic",
                          align_corners=False)
        return x.permute(0, 2, 3, 1).reshape(tgt * tgt, -1)

    def _block_attn(self, blk, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = blk["attn"]["in_proj"](x).reshape(b, n, self.heads, 3 * hd)
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        o = F.scaled_dot_product_attention(q, k, v)
        return blk["attn"]["out_proj"](o.permute(0, 2, 1, 3).reshape(b, n, d))

    def forward(self, pix_nchw):
        x = self.conv1(pix_nchw)
        b, d, gh, gw = x.shape
        x = x.reshape(b, d, gh * gw).permute(0, 2, 1)
        x = x + self._interp(self.positional_embedding, gh * gw)
        x = self.ln_pre(x)
        for blk in self.resblocks:
            x = x + self._block_attn(blk, blk["ln_1"](x))
            h = blk["ln_2"](x)
            x = x + blk["mlp"]["c_proj"](F.gelu(blk["mlp"]["c_fc"](h)))
        pool = self.attn_pool
        kv = pool["ln_kv"](pool["kv_proj"](x))
        q = pool["ln_q"](pool.query)
        q_in = (q + pool.pos_embed)[None].expand(b, -1, -1)
        k_in = kv + self._interp(pool.pos_embed, kv.shape[1])[None]
        dm = q.shape[-1]
        wq, wk, wv = pool.attn.in_proj_weight.chunk(3, dim=0)
        bq, bk, bv = pool.attn.in_proj_bias.chunk(3, dim=0)
        nq = q_in.shape[1]
        n = kv.shape[1]
        hd = dm // self.nh_pool
        qh = (q_in @ wq.T + bq).reshape(b, nq, self.nh_pool, hd).permute(0, 2, 1, 3)
        kh = (k_in @ wk.T + bk).reshape(b, n, self.nh_pool, hd).permute(0, 2, 1, 3)
        vh = (kv @ wv.T + bv).reshape(b, n, self.nh_pool, hd).permute(0, 2, 1, 3)
        o = F.scaled_dot_product_attention(qh, kh, vh)
        o = pool["attn"]["out_proj"](o.permute(0, 2, 1, 3).reshape(b, nq, dm))
        return self.ln_post(o) @ self.proj


def test_qwen_vl_tower_matches_torch():
    from paddlemix_tpu.models.qwen_vl import (
        QwenVisionConfig,
        QwenVisionTransformer,
        QwenVLForConditionalGeneration,
    )

    width, layers, heads, out_dim = 32, 2, 2, 256
    cfg = QwenVisionConfig(image_size=32, patch_size=8, width=width,
                           layers=layers, heads=heads, mlp_ratio=4.0,
                           output_dim=out_dim, pos_embed_size=2)
    tm = TorchQwenVisual(width, layers, heads, 4.0, out_dim, patch=8,
                         pos_size=2, n_queries=4, nh_pool=2).eval()
    flat = {"visual." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = unflatten_params(
        QwenVLForConditionalGeneration.convert_foreign_state_dict(flat, None))
    fm = QwenVisionTransformer(cfg, num_queries=4)
    pix = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    got = fm.apply({"params": params["visual"]}, jnp.asarray(pix))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(pix, (0, 3, 1, 2))))
    assert got.shape == (2, 4, out_dim)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-4, rtol=1e-3)


# ------------------------------------------------------------- InternViT
class _TorchRMSWeight(tnn.Module):
    """Carries the InternRMSNorm `.weight` key; math lives in _rms()."""

    def __init__(self, c):
        super().__init__()
        self.weight = tnn.Parameter(torch.rand(c) + 0.5)


class TorchInternViT(tnn.Module):
    """Reference modeling_intern_vit.py: conv patch embed + cls + interp pos
    (:196-246), fused-qkv attention with qk RMSNorm over the flattened head
    dim (:282-303), layer scales ls1/ls2 (:345-393)."""

    def __init__(self, c, heads, inter, layers, img, patch, eps=1e-6):
        super().__init__()
        self.heads, self.eps = heads, eps
        self.patch_embedding = tnn.Conv2d(3, c, patch, stride=patch)
        self.class_embedding = tnn.Parameter(torch.randn(1, 1, c) * 0.02)
        n_pos = (img // patch) ** 2 + 1
        self.position_embedding = tnn.Parameter(torch.randn(1, n_pos, c) * 0.02)
        blocks = []
        for _ in range(layers):
            blk = tnn.ModuleDict({
                "norm1": tnn.LayerNorm(c, eps=eps),
                "norm2": tnn.LayerNorm(c, eps=eps)})
            blk["attn"] = tnn.ModuleDict({
                "qkv": tnn.Linear(c, 3 * c),
                "proj": tnn.Linear(c, c),
                "q_norm": _TorchRMSWeight(c),
                "k_norm": _TorchRMSWeight(c)})
            blk["mlp"] = tnn.ModuleDict({
                "fc1": tnn.Linear(c, inter), "fc2": tnn.Linear(inter, c)})
            blk.ls1 = tnn.Parameter(torch.rand(c) * 0.2)
            blk.ls2 = tnn.Parameter(torch.rand(c) * 0.2)
            blocks.append(blk)
        self.layers = tnn.ModuleList(blocks)

    def _rms(self, x, w):
        v = x.float()
        v = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + self.eps)
        return v * w

    def _attn(self, blk, x):
        b, n, c = x.shape
        hd = c // self.heads
        qkv = blk["attn"]["qkv"](x).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = self._rms(q.reshape(b, n, c), blk["attn"]["q_norm"].weight).reshape(b, n, self.heads, hd)
        k = self._rms(k.reshape(b, n, c), blk["attn"]["k_norm"].weight).reshape(b, n, self.heads, hd)
        o = F.scaled_dot_product_attention(q.permute(0, 2, 1, 3),
                                           k.permute(0, 2, 1, 3),
                                           v.permute(0, 2, 1, 3))
        return blk["attn"]["proj"](o.permute(0, 2, 1, 3).reshape(b, n, c))

    def forward(self, pix):
        x = self.patch_embedding(pix)
        b, c, gh, gw = x.shape
        x = x.reshape(b, c, gh * gw).permute(0, 2, 1)
        x = torch.cat([self.class_embedding.expand(b, -1, -1), x], dim=1)
        pos = self.position_embedding
        n = pos.shape[1] - 1
        src = int(math.sqrt(n))
        if (src, src) != (gh, gw):
            body = pos[:, 1:].reshape(1, src, src, c).permute(0, 3, 1, 2)
            body = F.interpolate(body, size=(gh, gw), mode="bicubic",
                                 align_corners=False)
            body = body.permute(0, 2, 3, 1).reshape(1, gh * gw, c)
            pos = torch.cat([pos[:, :1], body], dim=1)
        x = x + pos
        for blk in self.layers:
            x = x + self._attn(blk, blk["norm1"](x)) * blk.ls1
            h = blk["norm2"](x)
            x = x + blk["mlp"]["fc2"](F.gelu(blk["mlp"]["fc1"](h))) * blk.ls2
        return x


def test_intern_vit_matches_torch():
    from paddlemix_tpu.models.internvl2 import InternVLChatModel
    from paddlemix_tpu.models.internvl2.intern_vit import (
        InternVisionConfig,
        InternVisionModel,
    )

    c, heads, inter, layers = 32, 2, 64, 2
    tm = TorchInternViT(c, heads, inter, layers, img=16, patch=8).eval()
    flat = {}
    for k, v in tm.state_dict().items():
        k = k.replace("layers.", "encoder.layers.")
        if not k.startswith("encoder."):
            k = "embeddings." + k
        flat["vision_model." + k] = v.detach().numpy()
    params = unflatten_params(
        InternVLChatModel.convert_foreign_state_dict(flat, None))
    cfg = InternVisionConfig(hidden_size=c, intermediate_size=inter,
                             num_hidden_layers=layers, num_attention_heads=heads,
                             image_size=16, patch_size=8, qk_normalization=True)
    fm = InternVisionModel(cfg)
    # 32px input vs 16px config -> exercises the CLS-preserving pos interp
    pix = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    got, _, _ = fm.apply({"params": params["vision_model"]}, jnp.asarray(pix))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(pix, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_pixel_shuffle_matches_reference_semantics():
    """Numpy twin of the reference pixel_shuffle v2 path
    (modeling_internvl_chat.py): NCHW formulation re-derived independently."""
    from paddlemix_tpu.models.internvl2.modeling import pixel_shuffle

    rs = np.random.RandomState(1)
    x = rs.randn(2, 4, 4, 8).astype(np.float32)  # NHWC
    got = np.asarray(pixel_shuffle(jnp.asarray(x), 0.5, "v2"))
    # independent twin: reference does (N, W, H*s, C/s^2) then transpose
    b, h, w, c = x.shape
    t = x.reshape(b, h, w // 2, c * 2)
    t = np.transpose(t, (0, 2, 1, 3))
    t = t.reshape(b, w // 2, h // 2, c * 4)
    t = np.transpose(t, (0, 2, 1, 3))
    np.testing.assert_allclose(got, t, atol=0)
    assert got.shape == (2, 2, 2, 32)


# ------------------------------------------------- CogVLM vision expert
class TorchVisionExpertAttention(tnn.Module):
    """Reference cogvlm/modeling.py:208-295: per-token expert routing of the
    fused qkv and the output projection; one shared softmax; rope over
    CogVLM position ids."""

    def __init__(self, d, heads):
        super().__init__()
        self.heads = heads
        self.vision_expert_query_key_value = tnn.Linear(d, 3 * d, bias=False)
        self.language_expert_query_key_value = tnn.Linear(d, 3 * d, bias=False)
        self.vision_expert_dense = tnn.Linear(d, d, bias=False)
        self.language_expert_dense = tnn.Linear(d, d, bias=False)

    @staticmethod
    def _rope(x, positions, theta=10000.0):
        # matches ops.rope_cos_sin/apply_rope (half-split rotate)
        b, h, n, hd = x.shape
        inv = 1.0 / theta ** (torch.arange(0, hd, 2).float() / hd)
        ang = positions.float()[:, :, None] * inv[None, None]
        cos = torch.cos(ang)[:, None]
        sin = torch.sin(ang)[:, None]
        x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def forward(self, x, positions, vision_mask):
        b, n, d = x.shape
        hd = d // self.heads
        qkv_v = self.vision_expert_query_key_value(x)
        qkv_l = self.language_expert_query_key_value(x)
        qkv = torch.where(vision_mask[:, :, None], qkv_v, qkv_l)
        q, k, v = qkv.chunk(3, dim=-1)

        def heads_first(t):
            return t.reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        q = self._rope(q, positions)
        k = self._rope(k, positions)
        causal = torch.tril(torch.ones(n, n, dtype=torch.bool))
        o = F.scaled_dot_product_attention(q, k, v, attn_mask=causal)
        o = o.permute(0, 2, 1, 3).reshape(b, n, d)
        return torch.where(vision_mask[:, :, None],
                           self.vision_expert_dense(o),
                           self.language_expert_dense(o))


def test_cogvlm_vision_expert_attention_matches_torch():
    from paddlemix_tpu.models.cogvlm.modeling import (
        VisionExpertAttention,
        build_position_ids,
        get_expert_mask,
    )
    from paddlemix_tpu.models.llama import LlamaConfig

    d, heads, n = 32, 2, 10
    tm = TorchVisionExpertAttention(d, heads).eval()
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    from paddlemix_tpu.core.modeling import convert_torch_state_dict

    params = unflatten_params(convert_torch_state_dict(
        flat, ((r"\.weight$", r".kernel"),)))
    cfg = LlamaConfig.from_dict(dict(hidden_size=d, num_attention_heads=heads,
                                     num_key_value_heads=heads))
    fm = VisionExpertAttention(cfg)
    is_v = np.zeros((1, n), bool)
    is_v[0, 2:8] = True
    is_vj = jnp.asarray(is_v)
    vm, _ = get_expert_mask(is_vj)
    pos = build_position_ids(is_vj)
    x = np.random.RandomState(0).randn(1, n, d).astype(np.float32)
    got = fm.apply({"params": params}, jnp.asarray(x), pos, vm)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(np.asarray(pos)),
                 torch.from_numpy(np.asarray(vm)))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_cogvlm_glu_and_postnorm_layer_match_torch():
    """EVA2CLIP specifics a skeleton gets wrong: the GLU adapter
    (visual.py:983-1005) and the POST-op layernorm residual placement
    (visual.py:960-967)."""
    from paddlemix_tpu.models.cogvlm.visual import GLU, CogVisionLayer, CogVisionConfig

    d, inter = 16, 32
    rs = np.random.RandomState(1)

    class TorchGLU(tnn.Module):
        def __init__(self):
            super().__init__()
            self.linear_proj = tnn.Linear(8, d, bias=False)
            self.norm1 = tnn.LayerNorm(d)
            self.dense_h_to_4h = tnn.Linear(d, inter, bias=False)
            self.gate_proj = tnn.Linear(d, inter, bias=False)
            self.dense_4h_to_h = tnn.Linear(inter, d, bias=False)

        def forward(self, x):
            x = self.linear_proj(x)
            x = F.gelu(self.norm1(x))
            x = F.silu(self.gate_proj(x)) * self.dense_h_to_4h(x)
            return self.dense_4h_to_h(x)

    tm = TorchGLU().eval()
    from paddlemix_tpu.core.modeling import convert_torch_state_dict

    params = unflatten_params(convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in tm.state_dict().items()},
        ((r"norm1\.weight$", r"norm1.scale"), (r"\.weight$", r".kernel"))))
    x = rs.randn(2, 5, 8).astype(np.float32)
    got = GLU(d, inter).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5,
                               rtol=1e-4)

    # post-norm layer: x + LN(attn(x)); x + LN(mlp(x))
    class TorchCogLayer(tnn.Module):
        def __init__(self, c, heads):
            super().__init__()
            self.heads = heads
            self.query_key_value = tnn.Linear(c, 3 * c)
            self.dense = tnn.Linear(c, c)
            self.fc1 = tnn.Linear(c, 2 * c)
            self.fc2 = tnn.Linear(2 * c, c)
            self.input_layernorm = tnn.LayerNorm(c, eps=1e-6)
            self.post_attention_layernorm = tnn.LayerNorm(c, eps=1e-6)

        def forward(self, x):
            b, n, c = x.shape
            hd = c // self.heads
            qkv = self.query_key_value(x).reshape(b, n, 3, self.heads, hd)
            q, k, v = (qkv[:, :, i].permute(0, 2, 1, 3) for i in range(3))
            att = F.scaled_dot_product_attention(q, k, v)
            att = self.dense(att.permute(0, 2, 1, 3).reshape(b, n, c))
            x = x + self.input_layernorm(att)
            m = self.fc2(F.gelu(self.fc1(x)))
            return x + self.post_attention_layernorm(m)

    c, heads = 16, 2
    tl = TorchCogLayer(c, heads).eval()
    params = unflatten_params(convert_torch_state_dict(
        {k: v.detach().numpy() for k, v in tl.state_dict().items()},
        ((r"(input_layernorm|post_attention_layernorm)\.weight$", r"\1.scale"),
         (r"\.weight$", r".kernel"))))
    cfg = CogVisionConfig(hidden_size=c, num_heads=heads,
                          intermediate_size=2 * c, num_hidden_layers=1,
                          image_size=16, patch_size=8)
    x = rs.randn(1, 6, c).astype(np.float32)
    got = CogVisionLayer(cfg).apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-5,
                               rtol=1e-4)


# -------------------------------------------------- XComposer2 PLoRA
def test_plora_linear_matches_torch():
    """Reference internlm_xcomposer2/modeling.py:173-217: PLoRA(nn.Linear)
    adds Plora_B(Plora_A(x)) * (alpha/r) ONLY at image-mask positions."""
    from paddlemix_tpu.core.modeling import convert_torch_state_dict
    from paddlemix_tpu.models.internlm_xcomposer2.modeling import PLoRALinear

    in_f, out_f, r, alpha = 12, 20, 4, 8

    class TorchPLoRA(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lin = tnn.Linear(in_f, out_f, bias=False)
            self.Plora_A = tnn.Linear(in_f, r, bias=False)
            self.Plora_B = tnn.Linear(r, out_f, bias=False)

        def forward(self, x, im_mask):
            res = self.lin(x)
            delta = self.Plora_B(self.Plora_A(x)) * (alpha / r)
            return res + torch.where(im_mask[..., None], delta,
                                     torch.zeros(()))

    tm = TorchPLoRA().eval()
    with torch.no_grad():
        tm.Plora_B.weight.copy_(torch.randn(out_f, r))  # break zero-init
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    conv = convert_torch_state_dict(
        flat, ((r"^lin\.weight$", r"kernel"), (r"\.weight$", r".kernel")))
    params = unflatten_params(conv)
    fm = PLoRALinear(out_f, r, alpha / r)
    rs = np.random.RandomState(0)
    x = rs.randn(2, 6, in_f).astype(np.float32)
    mask = np.zeros((2, 6), bool)
    mask[:, 2:4] = True
    got = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x), torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-5,
                               rtol=1e-4)
    # text rows equal the pure-base projection
    base = x @ np.asarray(params["kernel"])
    np.testing.assert_allclose(np.asarray(got)[:, 0], base[:, 0], atol=2e-5)


# ---------------------------------------------- MiniGPT4 Q-Former bridge
def test_minigpt4_bridge_matches_hf():
    """MiniGPT4's vision->Q-Former->projector bridge against the HF Blip2
    implementation (the reference MiniGPT4 is BLIP-2 up to the projector,
    minigpt4/modeling.py:1229+): HF weights load through MiniGPT4's own
    converter and encode_image must reproduce HF's bridge output."""
    import pytest

    transformers = pytest.importorskip("transformers")

    from paddlemix_tpu.models.minigpt4 import (
        MiniGPT4Config,
        MiniGPT4ForConditionalGeneration,
    )

    hf_cfg = transformers.Blip2Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=8),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            cross_attention_frequency=2,
                            encoder_hidden_size=32, vocab_size=30),
        text_config=dict(model_type="opt", vocab_size=96, hidden_size=24,
                         ffn_dim=48, num_hidden_layers=1,
                         num_attention_heads=2, max_position_embeddings=64,
                         word_embed_proj_dim=24),
        num_query_tokens=4)
    hf = transformers.Blip2ForConditionalGeneration(hf_cfg).eval()
    flat = {k: v.detach().numpy() for k, v in hf.state_dict().items()
            if not k.startswith("language_model.")}

    cfg = MiniGPT4Config(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=16, patch_size=8),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            cross_attention_frequency=2,
                            encoder_hidden_size=32),
        text_config=dict(vocab_size=64, hidden_size=24, intermediate_size=48,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=64),
        num_query_tokens=4)
    model = MiniGPT4ForConditionalGeneration.from_state_dict(cfg, flat)

    px = np.random.RandomState(0).randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        image_embeds = hf.vision_model(torch.tensor(px)).last_hidden_state
        queries = hf.query_tokens.expand(1, -1, -1)
        q_out = hf.qformer(query_embeds=queries,
                           encoder_hidden_states=image_embeds).last_hidden_state
        hf_feats = hf.language_projection(q_out).numpy()
    feats = model.module.apply(
        {"params": model.params},
        jnp.asarray(np.transpose(px, (0, 2, 3, 1))),
        method=model.module.encode_image)
    np.testing.assert_allclose(np.asarray(feats), hf_feats, atol=5e-3)


# ------------------------------------------------- ImageBind audio tower
class TorchImageBindAudio(tnn.Module):
    """Reference audio path: OVERLAPPING conv 16/10 over the 128x204 mel
    image + stem LayerNorm (modeling.py:212-234), cls+pos, pre-LN trunk,
    LN(1e-6) -> cls -> biasless head -> normalize -> x20
    (modeling.py:452-461, :506-509)."""

    def __init__(self, d, heads, inter, embed, kernel, stride):
        super().__init__()
        self.heads = heads
        self.stem = tnn.Conv2d(1, d, kernel, stride=stride, bias=False)
        self.stem_norm = tnn.LayerNorm(d, eps=1e-5)
        self.cls_token = tnn.Parameter(torch.randn(d) * 0.01)
        self.q_proj = tnn.Linear(d, d)
        self.k_proj = tnn.Linear(d, d)
        self.v_proj = tnn.Linear(d, d)
        self.out_proj = tnn.Linear(d, d)
        self.norm1 = tnn.LayerNorm(d, eps=1e-5)
        self.norm2 = tnn.LayerNorm(d, eps=1e-5)
        self.fc1 = tnn.Linear(d, inter)
        self.fc2 = tnn.Linear(inter, d)
        self.norm = tnn.LayerNorm(d, eps=1e-6)
        self.head = tnn.Linear(d, embed, bias=False)
        self.pos_embed = None  # set after shapes known

    def forward(self, mel_nchw):
        x = self.stem(mel_nchw)
        b, d, gh, gw = x.shape
        x = x.reshape(b, d, gh * gw).permute(0, 2, 1)
        x = self.stem_norm(x)
        x = torch.cat([self.cls_token.expand(b, 1, -1), x], dim=1)
        x = x + self.pos_embed
        h = self.norm1(x)
        hd = d // self.heads

        def heads_first(t):
            return t.reshape(b, -1, self.heads, hd).permute(0, 2, 1, 3)

        o = F.scaled_dot_product_attention(
            heads_first(self.q_proj(h)), heads_first(self.k_proj(h)),
            heads_first(self.v_proj(h)))
        x = x + self.out_proj(o.permute(0, 2, 1, 3).reshape(b, -1, d))
        x = x + self.fc2(F.gelu(self.fc1(self.norm2(x))))
        pooled = self.norm(x)[:, 0]
        e = self.head(pooled)
        e = e / e.norm(dim=-1, keepdim=True)
        return e * 20.0


def test_imagebind_audio_tower_matches_torch():
    from paddlemix_tpu.core.modeling import convert_torch_state_dict
    from paddlemix_tpu.models.imagebind.modeling import (
        ModalityConfig,
        ModalityEncoder,
    )

    d, heads, inter, embed = 32, 2, 64, 16
    mel, tlen, kernel, stride = 32, 48, 16, 10
    tm = TorchImageBindAudio(d, heads, inter, embed, kernel, stride).eval()
    gh, gw = (mel - kernel) // stride + 1, (tlen - kernel) // stride + 1
    tm.pos_embed = tnn.Parameter(torch.randn(1, gh * gw + 1, d) * 0.01)

    key_map = (
        (r"^(q_proj|k_proj|v_proj|out_proj)\.", r"blocks_0.attn.\1."),
        (r"^(norm1|norm2)\.weight$", r"blocks_0.\1.scale"),
        (r"^(norm1|norm2)\.bias$", r"blocks_0.\1.bias"),
        (r"^(fc1|fc2)\.", r"blocks_0.mlp.\1."),
        (r"^stem_norm\.weight$", r"stem_norm.scale"),
        (r"^norm\.weight$", r"norm.scale"),
        (r"\.weight$", r".kernel"),
    )
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    flat["pos_embed"] = flat["pos_embed"][0]
    params = unflatten_params(convert_torch_state_dict(flat, key_map))
    cfg = ModalityConfig(hidden_size=d, num_hidden_layers=1,
                         num_attention_heads=heads, intermediate_size=inter,
                         input_size=tlen, num_mel_bins=mel, patch_size=kernel,
                         stride=stride, in_channels=1, stem_norm=True,
                         logit_scale_init=20.0)
    fm = ModalityEncoder("audio", cfg, embed)
    x = np.random.RandomState(0).randn(2, mel, tlen, 1).astype(np.float32)
    got = fm.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-4,
                               rtol=1e-3)


def test_qwen_ntk_and_logn_options():
    """QWen long-context knobs: NTK alpha rescales rope theta (different
    cos/sin past short range) and logn scales q beyond the train length."""
    import jax

    from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_hidden_layers=1, num_attention_heads=2,
                num_key_value_heads=2, max_position_embeddings=128)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (1, 16)))

    m0 = LlamaForCausalLM(LlamaConfig.from_dict(dict(base)))
    params = m0.module.init(jax.random.PRNGKey(0), ids)["params"]
    logits0 = m0.module.apply({"params": params}, ids)[0]

    cfg_ntk = LlamaConfig.from_dict(dict(base, rope_ntk_alpha=4.0))
    logits_ntk = LlamaForCausalLM(cfg_ntk).module.apply({"params": params}, ids)[0]
    assert float(jnp.abs(logits0 - logits_ntk).max()) > 1e-6

    cfg_logn = LlamaConfig.from_dict(dict(base, use_logn_attn=True,
                                          logn_seq_length=4))
    logits_logn = LlamaForCausalLM(cfg_logn).module.apply({"params": params}, ids)[0]
    # positions < logn_seq_length are unscaled -> identical logits there
    np.testing.assert_allclose(np.asarray(logits0[:, :4]),
                               np.asarray(logits_logn[:, :4]), atol=1e-5)
    assert float(jnp.abs(logits0[:, 8:] - logits_logn[:, 8:]).max()) > 1e-6

    assert cfg_logn.ntk_alpha_for(4) == 1.0
    assert cfg_logn.ntk_alpha_for(16) > 1.0


# ------------------------------------------------------------- EVA-02
class TorchEVA02(tnn.Module):
    """Independent torch twin of the reference EVA-02 finetune ViT
    (paddlemix/models/eva02/modeling_finetune.py): conv patch embed, cls +
    learned abs pos, blocks with separate q/k/v (k bias-less,
    modeling_finetune.py:184-186), EVA 2D axial rope on patch tokens only
    (clip/modules/rope.py VisionRotaryEmbeddingFast: interleaved pairs, half
    the head dim per axis), naiveswiglu + ffn_ln, mean-pooled fc_norm head."""

    def __init__(self, img, patch, d, heads, inter, layers, n_cls,
                 pt_seq_len):
        super().__init__()
        self.heads = heads
        self.patch_embed = tnn.Conv2d(3, d, patch, stride=patch)
        grid = img // patch
        self.grid = grid
        self.cls_token = tnn.Parameter(torch.randn(1, 1, d) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, grid * grid + 1, d) * 0.02)
        hd = d // heads
        # 2D axial rope tables, derived independently from the reference spec
        dim = hd // 2
        freqs = 1.0 / 10000.0 ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)
        t = torch.arange(grid).float()  # non-intp case: grid == pt_seq_len
        f = torch.einsum("i,j->ij", t, freqs).repeat_interleave(2, -1)
        full = torch.cat([f[:, None, :].expand(grid, grid, dim),
                          f[None, :, :].expand(grid, grid, dim)], -1)
        full = full.reshape(grid * grid, hd)
        self.register_buffer("rope_cos", full.cos())
        self.register_buffer("rope_sin", full.sin())
        self.blocks = tnn.ModuleList()
        for _ in range(layers):
            blk = tnn.ModuleDict({
                "norm1": tnn.LayerNorm(d, eps=1e-6),
                "q_proj": tnn.Linear(d, d, bias=True),
                "k_proj": tnn.Linear(d, d, bias=False),
                "v_proj": tnn.Linear(d, d, bias=True),
                "proj": tnn.Linear(d, d),
                "norm2": tnn.LayerNorm(d, eps=1e-6),
                "w1": tnn.Linear(d, inter),
                "w2": tnn.Linear(d, inter),
                "ffn_ln": tnn.LayerNorm(inter, eps=1e-6),
                "w3": tnn.Linear(inter, d),
            })
            self.blocks.append(blk)
        self.fc_norm = tnn.LayerNorm(d, eps=1e-6)
        self.head = tnn.Linear(d, n_cls)

    @staticmethod
    def _rot(x):
        x = x.reshape(*x.shape[:-1], -1, 2)
        x1, x2 = x[..., 0], x[..., 1]
        return torch.stack((-x2, x1), -1).reshape(*x.shape[:-2], -1)

    def forward(self, pix):
        b = pix.shape[0]
        x = self.patch_embed(pix).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.pos_embed
        n = x.shape[1]
        hd = x.shape[-1] // self.heads
        for blk in self.blocks:
            h = blk["norm1"](x)
            q = blk["q_proj"](h).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)
            k = blk["k_proj"](h).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)
            v = blk["v_proj"](h).reshape(b, n, self.heads, hd).permute(0, 2, 1, 3)
            # rope on patch tokens only (reference concats unrotated CLS)
            cos, sin = self.rope_cos[None, None], self.rope_sin[None, None]
            q = torch.cat([q[:, :, :1], q[:, :, 1:] * cos + self._rot(q[:, :, 1:]) * sin], 2)
            k = torch.cat([k[:, :, :1], k[:, :, 1:] * cos + self._rot(k[:, :, 1:]) * sin], 2)
            o = F.scaled_dot_product_attention(q, k, v)
            o = o.permute(0, 2, 1, 3).reshape(b, n, -1)
            x = x + blk["proj"](o)
            h = blk["norm2"](x)
            h = blk["ffn_ln"](F.silu(blk["w1"](h)) * blk["w2"](h))
            x = x + blk["w3"](h)
        return self.head(self.fc_norm(x[:, 1:].mean(1)))


def test_eva02_matches_torch():
    from paddlemix_tpu.models.eva02 import EVA02Config, EVA02Model

    d, heads, inter, layers, img, patch, n_cls = 32, 2, 64, 2, 32, 8, 10
    tm = TorchEVA02(img, patch, d, heads, inter, layers, n_cls,
                    pt_seq_len=img // patch).eval()

    def lin(m):
        p = {"kernel": m.weight.detach().numpy().T}
        if m.bias is not None:
            p["bias"] = m.bias.detach().numpy()
        return p

    def ln(m):
        return {"scale": m.weight.detach().numpy(),
                "bias": m.bias.detach().numpy()}

    params = {
        "patch_embed": {
            "kernel": tm.patch_embed.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": tm.patch_embed.bias.detach().numpy()},
        "cls_token": tm.cls_token.detach().numpy()[0, 0],
        "pos_embed": tm.pos_embed.detach().numpy(),
        "fc_norm": ln(tm.fc_norm),
        "head": lin(tm.head),
    }
    for i, blk in enumerate(tm.blocks):
        params[f"blocks_{i}"] = {
            "norm1": ln(blk["norm1"]), "q_proj": lin(blk["q_proj"]),
            "k_proj": lin(blk["k_proj"]), "v_proj": lin(blk["v_proj"]),
            "out_proj": lin(blk["proj"]), "norm2": ln(blk["norm2"]),
            "w1": lin(blk["w1"]), "w2": lin(blk["w2"]),
            "ffn_ln": ln(blk["ffn_ln"]), "w3": lin(blk["w3"]),
        }
    cfg = EVA02Config(image_size=img, patch_size=patch, hidden_size=d,
                      intermediate_size=inter, num_hidden_layers=layers,
                      num_attention_heads=heads, num_classes=n_cls,
                      pt_hw_seq_len=img // patch)
    fm = EVA02Model(cfg)
    pix = np.random.RandomState(0).randn(2, img, img, 3).astype(np.float32)
    got = fm.module.apply({"params": params}, jnp.asarray(pix))
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(pix, (0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=5e-4, rtol=1e-3)
