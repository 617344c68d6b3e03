"""Pipeline parallelism through the Trainer surface (VERDICT r3 task 8).

The reference exposes pp via its trainer wrap (blip2_trainer.py:306-354);
here TrainingArguments.pipeline_parallel_degree builds the stage-axis mesh
and a MeshAwareLoss binds the GPipe Llama loss to it inside Trainer.setup().
This trains a REAL 2-stage Llama through Trainer.train() on the CPU mesh —
not the dryrun helper — and checks parity against the plain single-device
loss on the same batch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from paddlemix_tpu.models.llama.pipeline import make_llama_pipeline_loss
from paddlemix_tpu.trainer import Trainer, TrainingArguments
from paddlemix_tpu.trainer.trainer import MeshAwareLoss

CFG = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=2, max_position_embeddings=32)


def make_batch(bs=4, seq=8, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(1, 64, (bs, seq)).astype(np.int32)
    return {"input_ids": ids, "labels": ids}


def _plain_loss(model, batch):
    logits, _ = model.module.apply({"params": model.params},
                                   jnp.asarray(batch["input_ids"]))
    logits = logits[:, :-1].astype(jnp.float32)
    tgt = jnp.asarray(batch["labels"])[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return float(jnp.mean(nll))


def test_trainer_trains_two_stage_llama_pipeline(tmp_path):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    loss = make_llama_pipeline_loss(model, num_microbatches=2)
    assert isinstance(loss, MeshAwareLoss)
    data = [make_batch(seed=i) for i in range(4)]
    args = TrainingArguments(
        output_dir=str(tmp_path), learning_rate=1e-3, max_steps=4,
        logging_steps=1, save_steps=100, warmup_steps=1,
        data_parallel_degree=2, pipeline_parallel_degree=2)
    tr = Trainer(model=model, args=args, loss_fn=loss, train_dataloader=data)
    result = tr.train()
    assert tr.mesh is not None and tr.mesh.shape["stage"] == 2
    assert tr.mesh.shape["data"] == 2
    assert callable(tr.loss_fn)  # bound by setup()
    assert result["final_step"] == 4


def test_pipeline_loss_first_step_matches_plain():
    """One pjit'ed pipeline train step == the dense forward's loss."""
    from paddlemix_tpu.optimization import create_optimizer
    from paddlemix_tpu.trainer import (
        create_train_state,
        make_train_step,
        shard_batch,
        shard_train_state,
    )
    from paddlemix_tpu.parallel.mesh import MeshConfig, create_mesh

    model = LlamaForCausalLM.from_config(CFG, seed=0)
    mesh = create_mesh(MeshConfig(2, 1, 1, 1, 2, 1),
                       devices=jax.devices()[:4])
    loss_fn = make_llama_pipeline_loss(model, num_microbatches=2).bind(mesh)
    tx = create_optimizer(1e-3, total_steps=5, max_grad_norm=None)
    state = create_train_state(model.params, tx)
    state = shard_train_state(state, mesh)
    step = make_train_step(loss_fn, tx, mesh=mesh, example_state=state)
    batch = shard_batch({k: jnp.asarray(v) for k, v in make_batch().items()},
                        mesh)
    with mesh:
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
    ref = _plain_loss(model, make_batch())
    np.testing.assert_allclose(float(metrics["loss"]), ref, atol=2e-3)
