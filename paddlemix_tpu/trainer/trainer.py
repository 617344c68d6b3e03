"""Trainer: one pjit-sharded training loop for every model family.

Rebuild of the reference trainer layer (paddlemix/trainer/):
 - get_trainer dispatch + CLIPTrainer custom step (trainer.py:40-240)
 - BLIP2Trainer._wrap_model hybrid-parallel wrap (blip2_trainer.py:275-421)
   -> mesh + sharding rules + jit (see train_state.py)
 - BenchmarkCallback ips/memory telemetry (blip2_trainer.py:125-155)
 - checkpoint save/resume (orbax async, replacing supervised_finetune.py:54-63)

Design: the model contributes a pure ``loss_fn(params, batch, rng)``; the
Trainer owns mesh, optimizer, accumulation, logging and checkpoints. There is
deliberately no per-model Trainer subclass zoo — custom behavior plugs in via
loss_fn and callbacks."""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..optimization import create_optimizer
from ..parallel.mesh import MeshConfig, create_mesh
from ..parallel.sharding import TRANSFORMER_RULES, Rules
from ..utils.log import logger
from .arguments import TrainingArguments
from .train_state import (
    TrainState,
    create_train_state,
    make_train_step,
    shard_batch,
    shard_train_state,
)


class Trainer:
    def __init__(
        self,
        model=None,
        args: Optional[TrainingArguments] = None,
        loss_fn: Optional[Callable] = None,
        train_dataloader: Optional[Iterable] = None,
        params=None,
        sharding_rules: Rules = TRANSFORMER_RULES,
        callbacks: Optional[list] = None,
    ):
        self.model = model
        self.args = args or TrainingArguments()
        self.loss_fn = loss_fn
        self.train_dataloader = train_dataloader
        self.params = params if params is not None else (model.params if model else None)
        self.sharding_rules = sharding_rules
        self.callbacks = callbacks or []
        self.mesh = None
        self.state: Optional[TrainState] = None
        self._ckpt_mgr = None

    # ------------------------------------------------------------ setup
    def _build_mesh(self):
        a = self.args
        n = jax.device_count()
        degrees = (a.data_parallel_degree, a.fsdp_parallel_degree,
                   a.tensor_parallel_degree, a.sequence_parallel_degree)
        if degrees[0] != -1:
            # explicit degrees: use exactly that many devices (reference allows
            # running on a subset of the visible accelerators)
            need = int(np.prod(degrees))
            if need == 1:
                return None
            return create_mesh(MeshConfig(*degrees), devices=jax.devices()[:need])
        if n == 1 and degrees[1] == 1 and degrees[2] == 1 and degrees[3] == 1:
            return None
        return create_mesh(MeshConfig(*degrees))

    def _total_steps(self, steps_per_epoch: Optional[int]) -> int:
        if self.args.max_steps > 0:
            return self.args.max_steps
        if steps_per_epoch:
            return steps_per_epoch * self.args.num_train_epochs
        return 10000

    def setup(self, steps_per_epoch: Optional[int] = None):
        a = self.args
        total = self._total_steps(steps_per_epoch)
        ld_kwargs = {}
        if getattr(a, "layer_decay", None) and a.layer_decay < 1.0:
            # layer-decay LR groups (reference optimization/clip_optimizer.py);
            # the block count comes from the model config when available
            cfg = getattr(self.model, "config", None)
            n_layers = (getattr(cfg, "num_hidden_layers", None)
                        or getattr(cfg, "num_layers", None) or 12)
            ld_kwargs = dict(layer_decay=a.layer_decay,
                             params=self.model.params, num_layers=n_layers)
        tx = create_optimizer(
            a.learning_rate, schedule=a.lr_scheduler_type, total_steps=total,
            warmup_steps=a.warmup_steps, weight_decay=a.weight_decay,
            beta1=a.adam_beta1, beta2=a.adam_beta2, eps=a.adam_epsilon,
            max_grad_norm=a.max_grad_norm, **ld_kwargs)
        if a.gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, a.gradient_accumulation_steps)
        self.tx = tx
        self.mesh = self._build_mesh()
        params = self.params
        if self.mesh is not None:
            # private copy: the sharded state is donated every step, and
            # device_put may alias the source buffers (would delete model.params)
            params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        state = create_train_state(params, tx)
        if self.mesh is not None:
            state = shard_train_state(state, self.mesh, self.sharding_rules)
        self.state = state
        self.step_fn = make_train_step(self.loss_fn, tx, mesh=self.mesh,
                                       rules=self.sharding_rules, example_state=state,
                                       donate=self.mesh is not None)
        if a.profiler_options:
            from .callbacks import parse_profiler_options

            cb = parse_profiler_options(a.profiler_options)
            if cb is not None:
                self.callbacks.append(cb)
        if a.benchmark:
            from .callbacks import BenchmarkCallback

            self.callbacks.append(BenchmarkCallback())
        if a.report_to == "tensorboard":
            from .callbacks import TensorBoardCallback

            self.callbacks.append(TensorBoardCallback(os.path.join(a.output_dir, "tb")))
        if a.resume_from_checkpoint:
            self.load_checkpoint(a.resume_from_checkpoint)
        return self

    # ------------------------------------------------------------ checkpoints
    def _checkpointer(self):
        import orbax.checkpoint as ocp

        if self._ckpt_mgr is None:
            path = os.path.abspath(os.path.join(self.args.output_dir, "checkpoints"))
            os.makedirs(path, exist_ok=True)
            options = ocp.CheckpointManagerOptions(
                max_to_keep=self.args.save_total_limit, enable_async_checkpointing=True)
            self._ckpt_mgr = ocp.CheckpointManager(path, options=options)
        return self._ckpt_mgr

    def save_checkpoint(self, step: int):
        import orbax.checkpoint as ocp

        mgr = self._checkpointer()
        mgr.save(step, args=ocp.args.StandardSave({"params": self.state.params,
                                                   "opt_state": self.state.opt_state,
                                                   "step": self.state.step}))

    def load_checkpoint(self, path_or_latest: str):
        import orbax.checkpoint as ocp

        mgr = self._checkpointer()
        if path_or_latest == "latest":
            step = mgr.latest_step()
        elif os.path.exists(str(path_or_latest)):
            # a concrete checkpoint dir (the reference's resume_from_checkpoint
            # semantics): .../<step> or .../<step>/ — take the step leaf
            leaf = os.path.basename(os.path.normpath(str(path_or_latest)))
            step = int(leaf)
        else:
            step = int(path_or_latest)
        if step is None:
            logger.warning("no checkpoint to resume from")
            return
        target = {"params": self.state.params, "opt_state": self.state.opt_state,
                  "step": self.state.step}
        restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        self.state = TrainState(restored["step"], restored["params"], restored["opt_state"])
        logger.info("resumed from checkpoint step %d", step)

    def finalize_checkpoints(self):
        if self._ckpt_mgr is not None:
            self._ckpt_mgr.wait_until_finished()

    # ------------------------------------------------------------ loop
    def install_preemption_handler(self):
        """TPU preemption safety (SURVEY §5: 'preemption-signal save'):
        SIGTERM/SIGINT set a flag; the train loop checkpoints at the next
        step boundary and exits cleanly instead of dying mid-write."""
        import signal

        self._preempted = False

        def _handler(signum, frame):
            logger.warning("signal %d received; will checkpoint and stop", signum)
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, _handler)
            except ValueError:  # non-main thread
                break

    def train(self, max_steps: Optional[int] = None):
        a = self.args
        assert self.train_dataloader is not None and self.loss_fn is not None
        if self.state is None:
            try:
                steps_per_epoch = len(self.train_dataloader)
            except TypeError:
                steps_per_epoch = None
            self.setup(steps_per_epoch)
        total = max_steps or self._total_steps(None)
        rng = jax.random.PRNGKey(a.seed)
        ips_window, t_last = [], time.time()
        samples_per_step = None
        step = int(self.state.step)
        metrics = {}

        for epoch in range(max(a.num_train_epochs, 1)):
            for batch in self.train_dataloader:
                if step >= total:
                    break
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if samples_per_step is None:
                    lead = next(iter(batch.values()))
                    samples_per_step = int(lead.shape[0])
                if self.mesh is not None:
                    n_batch_shards = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
                    if samples_per_step % n_batch_shards == 0:
                        batch = shard_batch(batch, self.mesh)
                    else:
                        logger.warning(
                            "batch size %d not divisible by data*fsdp=%d; replicating",
                            samples_per_step, n_batch_shards)
                rng, sub = jax.random.split(rng)
                ctx = self.mesh or _nullcontext()
                with ctx:
                    self.state, metrics = self.step_fn(self.state, batch, sub)
                step += 1

                now = time.time()
                ips_window.append(samples_per_step / max(now - t_last, 1e-9))
                t_last = now
                if step % a.logging_steps == 0:
                    loss = float(metrics["loss"])
                    ips = float(np.mean(ips_window[-a.logging_steps:]))
                    # 'ips' keyword matches the reference TIPC protocol
                    # (tests/test_tipc run_benchmark.sh:27-30 parses 'ips:')
                    logger.train("step %d/%d loss: %.4f ips: %.3f samples/sec", step,
                                 total, loss, ips)
                    for cb in self.callbacks:
                        cb(step=step, metrics={**metrics, "ips": ips})
                if a.save_steps and step % a.save_steps == 0:
                    self.save_checkpoint(step)
                if getattr(self, "_preempted", False):
                    logger.warning("preemption: saving checkpoint at step %d", step)
                    self.save_checkpoint(step)
                    break
            if step >= total or getattr(self, "_preempted", False):
                break
        self.finalize_checkpoints()
        return {"final_step": step, **{k: float(v) for k, v in metrics.items()
                                       if hasattr(v, "item") or np.isscalar(v)}}


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def get_trainer(model_name: str = "", **kwargs) -> Trainer:
    """Name-based dispatcher kept for API parity with the reference
    (trainer/trainer.py:152-240). All models share the one Trainer."""
    return Trainer(**kwargs)
