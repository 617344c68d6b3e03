"""Async DataLoader / device prefetch / reader telemetry / eval loop /
LengthGroupedSampler tests (VERDICT r2 items 3, 4, 7, weak-8)."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from paddlemix_tpu.datasets import DataLoader
from paddlemix_tpu.datasets.sampler import (
    LengthGroupedSampler,
    get_length_grouped_indices,
)
from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from paddlemix_tpu.models.llava import llava_loss
from paddlemix_tpu.trainer import Trainer, TrainingArguments

CFG = LlamaConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                  num_hidden_layers=2, num_attention_heads=2,
                  num_key_value_heads=2, max_position_embeddings=32)


def loss_fn_for(model):
    def loss_fn(params, batch, rng):
        logits, _ = model.module.apply({"params": params}, batch["input_ids"])
        return llava_loss(logits, batch["labels"])
    return loss_fn


class SlowDataset:
    """Each item costs sleep_s of 'preprocessing' on the host."""

    def __init__(self, n=64, sleep_s=0.0):
        self.n = n
        self.sleep_s = sleep_s

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.sleep_s:
            time.sleep(self.sleep_s)
        rng = np.random.RandomState(i)
        ids = rng.randint(1, 64, (8,)).astype(np.int32)
        return {"input_ids": ids, "labels": ids}


def test_async_loader_matches_sync_order():
    ds = SlowDataset(32)
    sync = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3))
    wrk = list(DataLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=4))
    assert len(sync) == len(wrk) == 8
    for a, b in zip(sync, wrk):
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])


def test_async_loader_overlaps_preprocessing():
    # 64 items x 5ms = 320ms of host work; 4 workers should cut wall time
    ds = SlowDataset(64, sleep_s=0.005)
    t0 = time.time()
    n_sync = sum(1 for _ in DataLoader(ds, batch_size=8))
    t_sync = time.time() - t0
    t0 = time.time()
    n_async = sum(1 for _ in DataLoader(ds, batch_size=8, num_workers=4))
    t_async = time.time() - t0
    assert n_sync == n_async == 8
    assert t_async < t_sync * 0.75, (t_sync, t_async)


def test_trainer_reader_cost_telemetry(caplog):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    ds = SlowDataset(64)
    loader = DataLoader(ds, batch_size=8, num_workers=2)
    args = TrainingArguments(output_dir="/tmp/_rd", max_steps=4,
                             logging_steps=2, save_steps=0, warmup_steps=1)
    tr = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                 train_dataloader=loader)
    seen = {}
    tr.callbacks.append(lambda step, metrics: seen.update(metrics))
    tr.train()
    assert "reader_cost" in seen and seen["reader_cost"] >= 0.0
    assert "ips" in seen


def test_trainer_trims_indivisible_batch(mesh8):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    args = TrainingArguments(output_dir="/tmp/_trim", max_steps=1,
                             data_parallel_degree=4, fsdp_parallel_degree=2)
    tr = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                 train_dataloader=[])
    tr.setup()
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 64, (11, 8)).astype(np.int32)  # 11 % 8 != 0
    batch = tr._prepare_batch({"input_ids": ids, "labels": ids})
    assert batch["input_ids"].shape[0] == 8  # trimmed, not replicated
    small = tr._prepare_batch({"input_ids": ids[:3], "labels": ids[:3]})
    assert small["input_ids"].shape[0] == 3  # < shards: replicated fallback


def test_evaluate_and_best_tracking(tmp_path):
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    ds = SlowDataset(32)
    train = DataLoader(ds, batch_size=8)
    evald = DataLoader(SlowDataset(16), batch_size=8)
    args = TrainingArguments(output_dir=str(tmp_path), max_steps=4,
                             logging_steps=2, save_steps=0, warmup_steps=1,
                             do_eval=True, eval_steps=2)
    tr = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                 train_dataloader=train, eval_dataloader=evald)
    result = tr.train()
    assert "eval_loss" in result and np.isfinite(result["eval_loss"])
    assert tr.best_metric is not None and tr.best_step in (2, 4)


def test_evaluate_with_custom_eval_fn_and_corpus_metrics():
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    evald = DataLoader(SlowDataset(16), batch_size=8)

    def eval_fn(params, batch):
        logits, _ = model.module.apply({"params": params}, batch["input_ids"])
        pred = jnp.argmax(logits, -1)
        return {"loss": llava_loss(logits, batch["labels"]),
                "pred": pred, "label": batch["labels"]}

    def compute_metrics(outs):
        return {"acc": float((outs["pred"][:, :-1] == outs["label"][:, 1:]).mean())}

    tr = Trainer(model=model, eval_dataloader=evald, eval_fn=eval_fn,
                 compute_metrics=compute_metrics)
    m = tr.evaluate()
    assert "eval_loss" in m and "eval_acc" in m
    assert 0.0 <= m["eval_acc"] <= 1.0


def test_length_grouped_indices_modality_split():
    # positive = multimodal, negative = text-only (reference convention)
    lengths = [10, 20, 30, 40, -5, -15, -25, -35] * 4
    idx = get_length_grouped_indices(lengths, batch_size=4, world_size=2)
    assert sorted(idx) == list(range(len(lengths)))
    arr = np.asarray(lengths)
    for i in range(0, len(idx), 4):
        batch = arr[idx[i:i + 4]]
        assert (batch > 0).all() or (batch < 0).all(), batch


def test_length_grouped_sampler_in_loader():
    lengths = [(i % 7) + 1 for i in range(32)]
    ds = SlowDataset(32)
    loader = DataLoader(ds, batch_size=4,
                        sampler=LengthGroupedSampler(lengths, batch_size=4))
    batches = list(loader)
    assert len(batches) == 8


def test_max_steps_spans_epochs(tmp_path):
    """max_steps OVERRIDES num_train_epochs: a small dataset is re-iterated
    until the step budget is spent (regression: the loop used to stop
    silently after num_train_epochs=1 — train_clip --synthetic did 4 of its
    requested steps)."""
    model = LlamaForCausalLM.from_config(CFG, seed=0)
    loader = DataLoader(SlowDataset(n=8), batch_size=4, num_workers=0)
    args = TrainingArguments(output_dir=str(tmp_path), max_steps=7,
                             logging_steps=100, save_steps=0)
    out = Trainer(model=model, args=args, loss_fn=loss_fn_for(model),
                  train_dataloader=loader).train()
    assert out["final_step"] == 7  # 2 steps/epoch -> needs 4 epochs
