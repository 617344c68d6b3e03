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


class MeshAwareLoss:
    """Wrap a ``mesh -> loss_fn`` factory. Pipeline/expert-parallel losses
    need the device mesh for their internal shard_map, but the Trainer builds
    the mesh in ``setup()`` — pass one of these as ``loss_fn`` and the
    Trainer binds it right after mesh creation (reference counterpart: the
    fleet PipelineLayer wrap inside blip2_trainer.py:306-354)."""

    def __init__(self, factory: Callable):
        self.factory = factory

    def bind(self, mesh) -> Callable:
        return self.factory(mesh)

    def __call__(self, *a, **k):  # pragma: no cover - guard against misuse
        raise TypeError("MeshAwareLoss must be bound to a mesh by "
                        "Trainer.setup() before being called")


class Trainer:
    def __init__(
        self,
        model=None,
        args: Optional[TrainingArguments] = None,
        loss_fn: Optional[Callable] = None,
        train_dataloader: Optional[Iterable] = None,
        eval_dataloader: Optional[Iterable] = None,
        eval_fn: Optional[Callable] = None,
        compute_metrics: Optional[Callable] = None,
        params=None,
        sharding_rules: Rules = TRANSFORMER_RULES,
        callbacks: Optional[list] = None,
    ):
        self.model = model
        self.args = args or TrainingArguments()
        self.loss_fn = loss_fn
        self.train_dataloader = train_dataloader
        self.eval_dataloader = eval_dataloader
        # eval_fn(params, batch) -> dict of per-batch metrics/arrays;
        # defaults to {'loss': loss_fn(...)}. compute_metrics(outputs) folds
        # the collected per-batch outputs into corpus metrics (the reference
        # BLIP2Trainer COCO caption/VQA eval, blip2_trainer.py:643-687).
        self.eval_fn = eval_fn
        self.compute_metrics = compute_metrics
        self.params = params if params is not None else (model.params if model else None)
        self.sharding_rules = sharding_rules
        self.callbacks = callbacks or []
        self.mesh = None
        self.state: Optional[TrainState] = None
        self._ckpt_mgr = None
        self.best_metric: Optional[float] = None
        self.best_step: Optional[int] = None
        self._eval_step_fn = None

    # ------------------------------------------------------------ setup
    def _build_mesh(self):
        a = self.args
        n = jax.device_count()
        cfg = MeshConfig(
            data_parallel_degree=a.data_parallel_degree,
            fsdp_parallel_degree=a.fsdp_parallel_degree,
            tensor_parallel_degree=a.tensor_parallel_degree,
            sequence_parallel_degree=a.sequence_parallel_degree,
            pipeline_parallel_degree=getattr(a, "pipeline_parallel_degree", 1),
            expert_parallel_degree=getattr(a, "expert_parallel_degree", 1))
        degrees = (cfg.data_parallel_degree, cfg.fsdp_parallel_degree,
                   cfg.tensor_parallel_degree, cfg.sequence_parallel_degree,
                   cfg.pipeline_parallel_degree, cfg.expert_parallel_degree)
        if degrees[0] != -1:
            # explicit degrees: use exactly that many devices (reference allows
            # running on a subset of the visible accelerators)
            need = int(np.prod(degrees))
            if need == 1:
                return None
            return create_mesh(cfg, devices=jax.devices()[:need])
        if n == 1 and all(d == 1 for d in degrees[1:]):
            return None
        return create_mesh(cfg)

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
        if isinstance(self.loss_fn, MeshAwareLoss):
            # pipeline/expert losses close over the mesh for their shard_map
            # (reference: blip2_trainer wraps the model in fleet PipelineLayer
            # at this same point, blip2_trainer.py:306-354)
            self.loss_fn = self.loss_fn.bind(self.mesh)
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

    def _prepare_batch(self, batch):
        """Host batch -> device arrays, trimmed + sharded for the mesh.

        A batch not divisible by data*fsdp is TRIMMED to the largest
        divisible sub-batch (dropping <n_shards samples) instead of silently
        replicating the whole batch to every shard — replication was an 8x
        throughput loss on exactly the misconfigurations users hit."""
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is None:
            return batch
        n_shards = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        bs = int(next(iter(batch.values())).shape[0])
        keep = (bs // n_shards) * n_shards
        if keep == 0:
            if not getattr(self, "_warned_replicate", False):
                logger.warning(
                    "batch size %d < data*fsdp=%d shards; replicating "
                    "(raise the batch size to shard it)", bs, n_shards)
                self._warned_replicate = True
            return batch
        if keep != bs:
            if not getattr(self, "_warned_trim", False):
                logger.warning(
                    "batch size %d not divisible by data*fsdp=%d; trimming "
                    "to %d samples/step", bs, n_shards, keep)
                self._warned_trim = True
            batch = {k: v[:keep] if v.shape and v.shape[0] == bs else v
                     for k, v in batch.items()}
        return shard_batch(batch, self.mesh)

    # ------------------------------------------------------------ eval
    def _build_eval_step(self):
        if self._eval_step_fn is not None:
            return self._eval_step_fn
        if self.eval_fn is not None:
            fn = self.eval_fn
        else:
            assert self.loss_fn is not None, "evaluate() needs eval_fn or loss_fn"

            def fn(params, batch):
                out = self.loss_fn(params, batch, jax.random.PRNGKey(0))
                loss = out[0] if isinstance(out, tuple) else out
                return {"loss": loss}

        self._eval_step_fn = jax.jit(fn)
        return self._eval_step_fn

    def evaluate(self, eval_dataloader=None, prefix: str = "eval"):
        """Jitted no-grad pass over the eval set. Scalar outputs are averaged;
        array outputs are collected for ``compute_metrics`` (corpus metrics:
        CIDEr/BLEU/VQA-acc from metrics/, reference blip2_trainer.py:643-687)."""
        loader = eval_dataloader or self.eval_dataloader
        assert loader is not None, "no eval_dataloader"
        step_fn = self._build_eval_step()
        params = self.state.params if self.state is not None else self.params
        sums: Dict[str, float] = {}
        collected: Dict[str, list] = {}
        n = 0
        ctx = self.mesh or _nullcontext()
        for batch in loader:
            batch = self._prepare_batch(batch)
            with ctx:
                out = step_fn(params, batch)
            for k, v in out.items():
                v = np.asarray(v)
                if v.ndim == 0:
                    sums[k] = sums.get(k, 0.0) + float(v)
                else:
                    collected.setdefault(k, []).append(v)
            n += 1
        metrics = {f"{prefix}_{k}": v / max(n, 1) for k, v in sums.items()}
        if self.compute_metrics is not None and collected:
            extra = self.compute_metrics(
                {k: np.concatenate(v) for k, v in collected.items()})
            metrics.update({f"{prefix}_{k}": float(v) for k, v in extra.items()})
        logger.train("eval @%d: %s", int(self.state.step) if self.state else 0,
                     " ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))
        for cb in self.callbacks:
            cb(step=int(self.state.step) if self.state else 0, metrics=metrics)
        return metrics

    def predict(self, dataloader, predict_fn):
        """Collect jitted per-batch predictions (reference Trainer.predict)."""
        fn = jax.jit(predict_fn)
        params = self.state.params if self.state is not None else self.params
        outs = []
        for batch in dataloader:
            outs.append(jax.tree_util.tree_map(
                np.asarray, fn(params, self._prepare_batch(batch))))
        return outs

    def _maybe_eval_and_track_best(self, step: int):
        metrics = self.evaluate()
        a = self.args
        key = f"eval_{a.metric_for_best_model}"
        if key not in metrics:
            return
        val = metrics[key]
        better = (self.best_metric is None
                  or (val > self.best_metric if a.greater_is_better
                      else val < self.best_metric))
        if better:
            self.best_metric, self.best_step = val, step
            logger.train("new best %s=%.4f at step %d", key, val, step)
            self.save_checkpoint(step)

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
        reader_window = []
        samples_per_step = None
        step = int(self.state.step)
        metrics = {}

        # max_steps (when set) OVERRIDES num_train_epochs, re-iterating the
        # dataloader as many epochs as needed (HF Trainer semantics; before
        # this, a max_steps run over a small dataset silently stopped at one
        # epoch — e.g. examples/train_clip.py --synthetic did 4 of its
        # requested steps)
        explicit_steps = (max_steps is not None
                          or getattr(a, "max_steps", -1) > 0)
        n_epochs = 10 ** 9 if explicit_steps else max(a.num_train_epochs, 1)
        for epoch in range(n_epochs):
            # device put-ahead: prepare (host->device + shard) the NEXT batch
            # while the current step runs — jax dispatch is async, so the
            # transfer overlaps compute and the loop only blocks on results.
            batches = _prefetch_to_device(iter(self.train_dataloader),
                                          self._prepare_batch,
                                          depth=a.prefetch_depth)
            for t_reader, batch in batches:
                if step >= total:
                    break
                reader_window.append(t_reader)
                if samples_per_step is None:
                    lead = next(iter(batch.values()))
                    samples_per_step = int(lead.shape[0])
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
                    reader_cost = float(np.mean(reader_window[-a.logging_steps:]))
                    reader_pct = reader_cost * ips / max(samples_per_step, 1) * 100
                    # 'ips' keyword matches the reference TIPC protocol
                    # (tests/test_tipc run_benchmark.sh:27-30 parses 'ips:');
                    # reader_cost mirrors BenchmarkCallback telemetry
                    # (blip2_trainer.py:125-155) — time the loop spent
                    # BLOCKED on input after overlap, not preprocessing time
                    logger.train(
                        "step %d/%d loss: %.4f ips: %.3f samples/sec "
                        "reader_cost: %.5f sec (%.1f%%)",
                        step, total, loss, ips, reader_cost, reader_pct)
                    for cb in self.callbacks:
                        cb(step=step, metrics={**metrics, "ips": ips,
                                               "reader_cost": reader_cost})
                if a.save_steps and step % a.save_steps == 0:
                    self.save_checkpoint(step)
                if a.do_eval and a.eval_steps and step % a.eval_steps == 0 \
                        and self.eval_dataloader is not None:
                    self._maybe_eval_and_track_best(step)
                if getattr(self, "_preempted", False):
                    logger.warning("preemption: saving checkpoint at step %d", step)
                    self.save_checkpoint(step)
                    break
            if step >= total or getattr(self, "_preempted", False):
                break
        final_eval = {}
        if a.do_eval and self.eval_dataloader is not None \
                and not getattr(self, "_preempted", False):
            final_eval = self.evaluate()
        self.finalize_checkpoints()
        return {"final_step": step, **final_eval,
                **{k: float(v) for k, v in metrics.items()
                   if hasattr(v, "item") or np.isscalar(v)}}


def _prefetch_to_device(it, prepare, depth: int = 2):
    """Keep ``depth`` prepared (device-resident, sharded) batches in flight.

    Yields (reader_wait_seconds, batch): the wait is the time this generator
    spent BLOCKED pulling from the host iterator — with a worker-pool
    DataLoader upstream and put-ahead here, it converges to ~0 when
    preprocessing is overlap-hidden (the <5% north-star clause)."""
    import collections

    buf = collections.deque()
    stall = 0.0
    while True:
        while len(buf) < max(depth, 1):
            t0 = time.time()
            nxt = next(it, _SENTINEL)
            stall += time.time() - t0
            if nxt is _SENTINEL:
                break
            buf.append(prepare(nxt))
        if not buf:
            return
        yield stall, buf.popleft()
        stall = 0.0


_SENTINEL = object()


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def get_trainer(model_name: str = "", **kwargs) -> Trainer:
    """Name-based dispatcher kept for API parity with the reference
    (trainer/trainer.py:152-240). All models share the one Trainer."""
    return Trainer(**kwargs)
