"""Gradient checkpointing (reference `recompute` /
enable_gradient_checkpointing): loss and grads must match the non-remat
path bit-for-bit-ish; memory trading is XLA's business."""

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.models.llama.modeling import LlamaConfig, LlamaForCausalLM

LLAMA_KW = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=2,
                num_key_value_heads=2, max_position_embeddings=32)


def _grad_norm(grads):
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(g))
                              for g in jax.tree_util.tree_leaves(grads))))


def test_llama_remat_grad_parity():
    base = LlamaForCausalLM.from_config(LlamaConfig(**LLAMA_KW), seed=0)
    remat = LlamaForCausalLM.from_config(
        LlamaConfig(**LLAMA_KW, gradient_checkpointing=True), seed=0)
    ids = jnp.asarray([[3, 9, 17, 4]], jnp.int32)
    tgt = jnp.asarray([[9, 17, 4, 22]], jnp.int32)

    def loss_fn(module):
        def fn(p):
            logits = module.apply({"params": p}, ids)[0]
            lp = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], -1))
        return fn

    l0, g0 = jax.value_and_grad(loss_fn(base.module))(base.params)
    l1, g1 = jax.value_and_grad(loss_fn(remat.module))(base.params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(_grad_norm(g0), _grad_norm(g1), rtol=1e-5)


def test_llama_scan_remat_grad_parity():
    """remat composes with scan_layers (the maxtext-style layout)."""
    from paddlemix_tpu.models.llama.modeling import stack_layer_params
    from flax import traverse_util

    base = LlamaForCausalLM.from_config(LlamaConfig(**LLAMA_KW), seed=0)
    flat = {".".join(p): np.asarray(v)
            for p, v in traverse_util.flatten_dict(base.params).items()}
    stacked = stack_layer_params(flat, LLAMA_KW["num_hidden_layers"])
    params = traverse_util.unflatten_dict(
        {tuple(k.split(".")): jnp.asarray(v) for k, v in stacked.items()})
    scan = LlamaForCausalLM.from_config(
        LlamaConfig(**LLAMA_KW, scan_layers=True,
                    gradient_checkpointing=True), seed=1)
    ids = jnp.asarray([[3, 9, 17, 4]], jnp.int32)

    ref = base.module.apply({"params": base.params}, ids)[0]
    out = scan.module.apply({"params": params}, ids)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)

    def fn(p):
        return jnp.mean(jnp.square(
            scan.module.apply({"params": p}, ids)[0]))

    g = jax.grad(fn)(params)
    assert _grad_norm(g) > 0 and np.isfinite(_grad_norm(g))


def test_unet_remat_grad_parity():
    from paddlemix_tpu.diffusers.models import (
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    kw = dict(sample_size=8, block_out_channels=(16, 32),
              down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
              up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
              layers_per_block=1, cross_attention_dim=16,
              attention_head_dim=2, norm_num_groups=8)
    base = UNet2DConditionModel.from_config(
        UNet2DConditionConfig.from_dict(kw), seed=0)
    remat = UNet2DConditionModel.from_config(
        UNet2DConditionConfig.from_dict(dict(kw, gradient_checkpointing=True)),
        seed=0)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16))
    t = jnp.asarray(5)

    def loss(module):
        def fn(p):
            return jnp.mean(jnp.square(
                module.apply({"params": p}, lat, t, ctx)))
        return fn

    l0, g0 = jax.value_and_grad(loss(base.module))(base.params)
    l1, g1 = jax.value_and_grad(loss(remat.module))(base.params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(_grad_norm(g0), _grad_norm(g1), rtol=1e-5)


def test_enable_recompute_vlm():
    """enable_recompute reaches a composite VLM's text trunk."""
    from paddlemix_tpu.core.modeling import enable_recompute
    from paddlemix_tpu.models.llava import (
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    cfg = LlavaConfig(
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=32, patch_size=16),
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=2, max_position_embeddings=32),
        image_token_index=63)
    model = LlavaForConditionalGeneration(cfg)
    params = model.module.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 6), jnp.int32),
                               pixel_values=jnp.zeros((1, 32, 32, 3)))["params"]
    model.params = params
    enable_recompute(model)
    assert model.config.text_config["gradient_checkpointing"] is True
    # rebuilt module still runs with the same params
    out = model.module.apply({"params": params},
                             jnp.zeros((1, 6), jnp.int32))[0]
    assert out.shape == (1, 6, 64)


def test_sft_recompute_flag(tmp_path):
    """'recompute': true in the SFT config flips the text trunk's flag."""
    import json

    from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
    from paddlemix_tpu.tools.supervised_finetune import main as sft_main

    model = LlamaForCausalLM.from_config(LlamaConfig(
        vocab_size=32, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64))
    ckpt = str(tmp_path / "ckpt")
    model.save_pretrained(ckpt)
    data = tmp_path / "data.jsonl"
    rows = [{"input_ids": list(range(1, 9)), "labels": list(range(1, 9))}
            for _ in range(4)]
    data.write_text("\n".join(json.dumps(r) for r in rows))
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({
        "model_name_or_path": ckpt, "dataset_path": str(data),
        "max_steps": 1, "mixtoken": False, "recompute": True,
        "max_length": 16, "data_parallel_degree": 1, "warmup_steps": 1,
        "per_device_train_batch_size": 2, "output_dir": str(tmp_path / "out"),
        "save_steps": 0, "logging_steps": 1, "bf16": False}))
    result = sft_main(str(cfg))
    assert result["final_step"] == 1


def test_sd3_remat_grad_parity():
    from paddlemix_tpu.diffusers.models import (
        SD3Transformer2DModel,
        SD3TransformerConfig,
    )

    kw = dict(sample_size=8, patch_size=2, in_channels=4, num_layers=2,
              attention_head_dim=8, num_attention_heads=2,
              joint_attention_dim=16, caption_projection_dim=16,
              pooled_projection_dim=16, out_channels=4, pos_embed_max_size=8)
    base = SD3Transformer2DModel.from_config(SD3TransformerConfig(**kw),
                                             seed=0)
    remat = SD3Transformer2DModel.from_config(
        SD3TransformerConfig(**kw, gradient_checkpointing=True), seed=0)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 16))
    pooled = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    t = jnp.asarray([5.0])

    def loss(module):
        def fn(p):
            return jnp.mean(jnp.square(
                module.apply({"params": p}, lat, t, ctx, pooled)))
        return fn

    l0, g0 = jax.value_and_grad(loss(base.module))(base.params)
    l1, g1 = jax.value_and_grad(loss(remat.module))(base.params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(_grad_norm(g0), _grad_norm(g1), rtol=1e-5)
