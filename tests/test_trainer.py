"""Trainer / optimization / EMA / LoRA tests, incl. a full sharded training
run on the 8-device mesh with checkpoint save+resume."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from paddlemix_tpu.models.llava import llava_loss
from paddlemix_tpu.optimization import create_optimizer, no_weight_decay_mask
from paddlemix_tpu.peft import LoraConfig, load_lora, lora_init, lora_loss_fn, merge_params, save_lora
from paddlemix_tpu.trainer import (
    EMAState,
    Trainer,
    TrainingArguments,
    create_train_state,
    ema_init,
    ema_update,
    make_train_step,
    shard_batch,
    shard_train_state,
)

CFG = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
                  max_position_embeddings=32)


def make_batch(bs=8, seq=8, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, 64, (bs, seq)).astype(np.int32)
    return {"input_ids": ids, "labels": ids}


def loss_fn_for(model):
    def loss_fn(params, batch, rng):
        logits, _ = model.module.apply({"params": params}, batch["input_ids"])
        return llava_loss(logits, batch["labels"])

    return loss_fn


def test_single_device_train_step_reduces_loss():
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    tx = create_optimizer(1e-2, total_steps=30, warmup_steps=1)
    state = create_train_state(model.params, tx)
    step = make_train_step(loss_fn_for(model), tx)
    batch = {k: jnp.asarray(v) for k, v in make_batch().items()}
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(15):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses


def test_sharded_train_matches_single_device(mesh8):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    tx = create_optimizer(1e-3, total_steps=10, max_grad_norm=None)
    loss_fn = loss_fn_for(model)
    batch_np = make_batch()

    state1 = create_train_state(model.params, tx)
    step1 = make_train_step(loss_fn, tx)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state1, m1 = step1(state1, batch, jax.random.PRNGKey(0))

    state8 = create_train_state(model.params, tx)
    state8 = shard_train_state(state8, mesh8)
    step8 = make_train_step(loss_fn, tx, mesh=mesh8, example_state=state8)
    sharded = shard_batch(batch, mesh8)
    with mesh8:
        state8, m8 = step8(state8, sharded, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # params updated identically
    l1 = jax.tree_util.tree_leaves(state1.params)[3]
    l8 = jax.tree_util.tree_leaves(state8.params)[3]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=1e-5)


def test_trainer_loop_and_resume(tmp_path):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    data = [make_batch(bs=4, seed=i) for i in range(6)]
    args = TrainingArguments(output_dir=str(tmp_path), learning_rate=1e-3,
                             max_steps=5, logging_steps=2, save_steps=5,
                             warmup_steps=1, num_train_epochs=10)
    trainer = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                      train_dataloader=data)
    result = trainer.train()
    assert result["final_step"] == 5
    assert os.path.isdir(tmp_path / "checkpoints")

    # resume picks up where we left off
    trainer2 = Trainer(model=model, args=args.replace(max_steps=7),
                       loss_fn=loss_fn_for(model), train_dataloader=data)
    trainer2.setup()
    trainer2.load_checkpoint("latest")
    assert int(trainer2.state.step) == 5
    result2 = trainer2.train(max_steps=7)
    assert result2["final_step"] == 7


def test_grad_accumulation():
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    args = TrainingArguments(learning_rate=1e-3, max_steps=4, logging_steps=10,
                             gradient_accumulation_steps=2, save_steps=0)
    trainer = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                      train_dataloader=[make_batch(bs=2, seed=i) for i in range(8)])
    trainer.setup()
    p0 = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
    trainer.train()
    p1 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert float(jnp.abs(p1 - p0).max()) > 0  # updates applied after accumulation


def test_no_weight_decay_mask():
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    mask = no_weight_decay_mask(model.params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    decayed = {"/".join(str(p) for p in path): v for path, v in flat}
    assert any(v for v in decayed.values())
    for path, v in decayed.items():
        if "layernorm" in path or "embedding" in path:
            assert not v, path


def test_ema():
    params = {"w": jnp.ones((4,))}
    state = ema_init(params)
    for _ in range(5):
        state = ema_update(state, {"w": jnp.zeros((4,))}, decay=0.5, use_warmup=False)
    assert float(state.params["w"][0]) == pytest.approx(0.5 ** 5)
    assert int(state.count) == 5


def test_lora_roundtrip_and_training(tmp_path):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    cfg = LoraConfig(r=4, lora_alpha=8)
    lora = lora_init(model.params, cfg, jax.random.PRNGKey(0))
    assert len(lora) > 0

    # b=0 -> merged params identical to base
    merged = merge_params(model.params, lora, cfg)
    l0 = jax.tree_util.tree_leaves(model.params)[3]
    m0 = jax.tree_util.tree_leaves(merged)[3]
    np.testing.assert_allclose(np.asarray(l0), np.asarray(m0), atol=1e-6)

    # train only lora params; base must stay fixed
    loss = lora_loss_fn(loss_fn_for(model), model.params, cfg)
    tx = optax.adam(1e-2)
    opt = tx.init(lora)
    batch = {k: jnp.asarray(v) for k, v in make_batch(bs=2).items()}

    @jax.jit
    def step(lora, opt):
        l, g = jax.value_and_grad(loss)(lora, batch, None)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(lora, updates), opt, l

    l_start = None
    for i in range(10):
        lora, opt, l = step(lora, opt)
        l_start = l_start if l_start is not None else float(l)
    assert float(l) < l_start

    save_lora(lora, cfg, str(tmp_path))
    lora2, cfg2 = load_lora(str(tmp_path))
    assert cfg2.r == 4
    k = next(iter(lora))
    np.testing.assert_allclose(np.asarray(lora[k]["a"]), np.asarray(lora2[k]["a"]), atol=1e-6)


def test_callbacks(tmp_path):
    from paddlemix_tpu.trainer import BenchmarkCallback, parse_profiler_options

    cb = BenchmarkCallback(skip_steps=1, log_every=100)
    for s in range(1, 8):
        cb(step=s, metrics={"ips": 10.0 + s, "loss": 1.0})
    summary = cb.summary()
    assert summary["steps"] == 6 and summary["mean_ips"] > 10
    prof = parse_profiler_options("batch_range=[2,4];state=GPU")
    assert prof.start_step == 2 and prof.end_step == 4
    assert parse_profiler_options(None) is None

    # trainer wires benchmark + tensorboard callbacks
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    args = TrainingArguments(output_dir=str(tmp_path), max_steps=3, logging_steps=1,
                             save_steps=0, benchmark=True, report_to="tensorboard",
                             data_parallel_degree=1)
    t = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                train_dataloader=[make_batch(bs=2, seed=i) for i in range(4)])
    t.train()
    assert any(type(c).__name__ == "BenchmarkCallback" for c in t.callbacks)


def test_preemption_checkpoint(tmp_path):
    """SIGTERM mid-training saves a checkpoint and stops cleanly."""
    import os
    import signal

    model = LlamaForCausalLM.from_config(CFG, seed=0)
    data = [make_batch(bs=4, seed=i) for i in range(8)]
    args = TrainingArguments(output_dir=str(tmp_path), learning_rate=1e-3,
                             max_steps=50, logging_steps=1, save_steps=0,
                             num_train_epochs=10)

    class Hook:
        n = 0

        def __call__(self, step, metrics):
            Hook.n += 1
            if Hook.n == 2:
                os.kill(os.getpid(), signal.SIGTERM)

    trainer = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                      train_dataloader=data, callbacks=[Hook()])
    trainer.install_preemption_handler()
    result = trainer.train()
    assert result["final_step"] < 50
    assert os.path.isdir(tmp_path / "checkpoints")
