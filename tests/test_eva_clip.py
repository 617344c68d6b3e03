"""EVA ViT / EVA-CLIP tests.

The parity test re-implements the reference EVA semantics
(paddlemix/models/clip/vit_model.py Attention:185 / Block:361 / SwiGLU:128,
modules/rope.py VisionRotaryEmbeddingFast) independently in torch and checks
our flax tower matches on the same weights — this pins the EVA specifics:
k_proj without bias, interleaved 2-D rope skipping CLS, sub-LN placement,
SwiGLU, and the post-norm block order."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from paddlemix_tpu.models.clip import (
    EVACLIP,
    EVACLIPConfig,
    EVAVisionConfig,
    EVAVisionTransformer,
    vision_rope_2d,
)

VCFG = dict(image_size=32, patch_size=8, width=64, layers=2, head_width=16,
            mlp_ratio=2.0, output_dim=24, pt_hw_seq_len=4, intp_freq=True)


def _torch_rope_tables(grid, head_dim, pt_seq_len, theta=10000.0):
    dim = head_dim // 2
    freqs = 1.0 / theta ** (torch.arange(0, dim, 2)[: dim // 2].double() / dim)
    t = torch.arange(grid).double() / grid * pt_seq_len
    band = torch.repeat_interleave(torch.outer(t, freqs), 2, dim=-1)
    fh = band[:, None, :].expand(grid, grid, dim)
    fw = band[None, :, :].expand(grid, grid, dim)
    full = torch.cat([fh, fw], dim=-1).reshape(grid * grid, head_dim)
    return full.cos().float(), full.sin().float()


def _torch_rot_half(x):
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    a, b = x2.unbind(-1)
    return torch.stack((-b, a), dim=-1).reshape(*x.shape)


def _torch_eva_forward(px, params, cfg):
    """Independent torch re-implementation of the EVA tower forward."""
    g = lambda *ks: torch.from_numpy(np.asarray(_dig(params, ks))).float()
    grid = cfg["image_size"] // cfg["patch_size"]
    width, hw = cfg["width"], cfg["head_width"]
    nh = width // hw

    # patch embed: flax HWIO conv kernel -> torch conv weight OIHW
    kern = g("patch_embed", "proj", "kernel").permute(3, 2, 0, 1)
    x = torch.nn.functional.conv2d(px, kern, g("patch_embed", "proj", "bias"),
                                   stride=cfg["patch_size"])
    x = x.flatten(2).transpose(1, 2)  # (B, N, C)
    cls = g("cls_token").expand(x.shape[0], 1, width)
    x = torch.cat([cls, x], dim=1)
    x = x + g("pos_embed")

    cos, sin = _torch_rope_tables(grid, hw, cfg["pt_hw_seq_len"])

    def ln(t, scale, bias):
        return torch.nn.functional.layer_norm(t, (t.shape[-1],), scale, bias,
                                              eps=1e-6)

    for i in range(cfg["layers"]):
        blk = lambda *ks: g(f"blocks_{i}", *ks)
        h = ln(x, blk("norm1", "scale"), blk("norm1", "bias"))
        B, N = h.shape[:2]
        q = (h @ blk("q_proj", "kernel") + blk("q_proj", "bias")).reshape(B, N, nh, hw)
        k = (h @ blk("k_proj", "kernel")).reshape(B, N, nh, hw)  # NO bias
        v = (h @ blk("v_proj", "kernel") + blk("v_proj", "bias")).reshape(B, N, nh, hw)

        def rope(t):
            body = t[:, 1:]
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            rot = body * c + _torch_rot_half(body) * s
            return torch.cat([t[:, :1], rot], dim=1)

        q, k = rope(q), rope(k)
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(hw), dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, width)
        out = ln(out, blk("inner_attn_ln", "scale"), blk("inner_attn_ln", "bias"))
        out = out @ blk("proj", "kernel") + blk("proj", "bias")
        x = x + out

        h = ln(x, blk("norm2", "scale"), blk("norm2", "bias"))
        x1 = h @ blk("w1", "kernel") + blk("w1", "bias")
        x2 = h @ blk("w2", "kernel") + blk("w2", "bias")
        hid = torch.nn.functional.silu(x1) * x2
        hid = ln(hid, blk("ffn_ln", "scale"), blk("ffn_ln", "bias"))
        x = x + (hid @ blk("w3", "kernel") + blk("w3", "bias"))

    x = ln(x, g("norm", "scale"), g("norm", "bias"))[:, 0]
    return x @ g("head", "kernel") + g("head", "bias")


def _dig(tree, keys):
    for k in keys:
        tree = tree[k]
    return tree


@pytest.fixture(scope="module")
def eva_model():
    return EVAVisionTransformer.from_config(EVAVisionConfig.from_dict(VCFG), seed=0)


def test_eva_vision_matches_torch_reference(eva_model):
    px = np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    ours = eva_model.module.apply({"params": eva_model.params}, jnp.asarray(px))
    ref = _torch_eva_forward(torch.from_numpy(px).permute(0, 3, 1, 2),
                             eva_model.params, VCFG)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-3)


def test_eva_k_proj_has_no_bias(eva_model):
    blk = eva_model.params["blocks_0"]
    assert "bias" not in blk["k_proj"]
    assert "bias" in blk["q_proj"] and "bias" in blk["v_proj"]


def test_eva_postnorm_variant():
    cfg = EVAVisionConfig.from_dict(dict(VCFG, postnorm=True, init_values=0.1))
    m = EVAVisionTransformer.from_config(cfg, seed=0)
    px = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3), jnp.float32)
    out = m.module.apply({"params": m.params}, px)
    assert out.shape == (1, 24)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert "gamma_1" in m.params["blocks_0"]


def test_eva_rope_tables_match_torch():
    cos_j, sin_j = vision_rope_2d(4, 16, pt_seq_len=4, intp_freq=True)
    cos_t, sin_t = _torch_rope_tables(4, 16, 4)
    np.testing.assert_allclose(np.asarray(cos_j), cos_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_j), sin_t.numpy(), atol=1e-6)


def test_eva_mean_pooling_and_mlp_variant():
    cfg = EVAVisionConfig.from_dict(dict(VCFG, use_mean_pooling=True,
                                         naiveswiglu=False, subln=False,
                                         rope=False))
    m = EVAVisionTransformer.from_config(cfg, seed=0)
    px = jnp.ones((1, 32, 32, 3))
    out = m.module.apply({"params": m.params}, px)
    assert out.shape == (1, 24)
    assert "fc1" in m.params["blocks_0"] and "fc_norm" in m.params


def test_eva_clip_end_to_end():
    cfg = EVACLIPConfig(
        vision_cfg=dict(VCFG), embed_dim=24,
        text_cfg=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=2,
                      max_position_embeddings=16, eos_token_id=3))
    model = EVACLIP.from_config(cfg, seed=0)
    px = jnp.ones((2, 32, 32, 3))
    ids = jnp.asarray([[1, 5, 9, 3], [2, 7, 3, 0]], jnp.int32)
    out = model.module.apply({"params": model.params}, px, ids)
    assert out["image_features"].shape == (2, 24)
    assert out["text_features"].shape == (2, 24)
    assert np.isfinite(float(out["loss"]))
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out["image_features"], axis=-1)),
        np.ones(2), atol=1e-5)


def test_eva_torch_checkpoint_key_map(tmp_path, eva_model):
    """EVA-style torch state dict (blocks.N.attn.q_proj..., mlp.w1...) loads
    through the key map with correct value placement."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(eva_model.params)
    sd = {}
    for kpath, val in flat.items():
        arr = np.asarray(val)
        name = ".".join(kpath)
        name = name.replace("patch_embed.proj.kernel", "patch_embed.proj.weight")
        for mod in ("q_proj", "k_proj", "v_proj", "proj", "inner_attn_ln"):
            name = name.replace(f".{mod}.", f".attn.{mod}.") \
                if name.startswith("blocks_") and f".{mod}." in name and "patch" not in name else name
        for mod in ("w1", "w2", "w3", "ffn_ln"):
            name = name.replace(f".{mod}.", f".mlp.{mod}.")
        name = name.replace("blocks_", "blocks.")
        if name.endswith(".kernel"):
            name = name[: -len(".kernel")] + ".weight"
            if arr.ndim == 2:
                arr = arr.T  # torch linear layout
            elif arr.ndim == 4:
                arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        if name.endswith(".scale"):
            name = name[: -len(".scale")] + ".weight"
        sd[name] = torch.from_numpy(arr.copy())
    torch.save(sd, tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(
        EVAVisionConfig.from_dict(VCFG).to_json_string())

    m2 = EVAVisionTransformer.from_pretrained(str(tmp_path))
    px = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(m2.module.apply({"params": m2.params}, px)),
        np.asarray(eva_model.module.apply({"params": eva_model.params}, px)),
        atol=1e-5)


def test_blip2_with_eva_tower():
    """BLIP-2 accepts the EVA tower (reference blip2/eva_vit.py pairing)."""
    from paddlemix_tpu.models.blip2.modeling import (
        Blip2Config,
        Blip2ForConditionalGeneration,
    )

    cfg = Blip2Config(
        vision_tower="eva",
        vision_config=dict(VCFG),
        qformer_config=dict(hidden_size=32, num_hidden_layers=2,
                            num_attention_heads=2, intermediate_size=64,
                            encoder_hidden_size=64),
        text_config=dict(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         max_position_embeddings=32),
        num_query_tokens=4)
    model = Blip2ForConditionalGeneration.from_config(cfg, seed=0)
    px = jnp.ones((1, 32, 32, 3))
    q = model.module.apply({"params": model.params}, px,
                           method=model.module.encode_image)
    assert q.shape == (1, 4, 32)
    assert bool(jnp.all(jnp.isfinite(q)))
