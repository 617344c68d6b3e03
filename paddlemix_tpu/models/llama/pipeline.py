"""Pipeline-parallel Llama forward.

Wires parallel/pipeline.py's GPipe schedule into the real model (the
reference's fleet pp_degree runs PaddleNLP's PipelineLayer Llama; round-1
shipped the schedule library-only): the decoder layers split into uniform
stages whose params stack on the "stage" mesh axis; embedding and the
norm+lm_head run replicated outside the pipeline; activations rotate
stage->stage+1 over ppermute with microbatching amortizing the bubble.
jax.grad differentiates straight through, so the same forward backs
training."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ...parallel.pipeline import make_pipeline_forward, stack_stage_params
from .modeling import LlamaDecoderLayer, LlamaForCausalLM


def make_llama_pipeline_forward(model: LlamaForCausalLM, mesh, *,
                                num_microbatches: int = 4):
    """Returns fn(params, input_ids) -> logits running the decoder stack as a
    GPipe pipeline over mesh's "stage" axis. params = model.params (the
    per-layer subtrees are stacked internally per call; pre-stack and reuse
    for training loops)."""
    cfg = model.config
    n_stages = mesh.shape["stage"]
    assert cfg.num_hidden_layers % n_stages == 0, \
        (cfg.num_hidden_layers, n_stages)
    layer_mod = LlamaDecoderLayer(cfg, dtype=model.dtype)

    def stage_fn(stage_params, x):
        b, s = x.shape[:2]
        positions = jnp.broadcast_to(jnp.arange(s), (b, s))

        def one_layer(h, lp):
            out, _ = layer_mod.apply({"params": lp}, h, positions)
            return out, None

        x, _ = jax.lax.scan(one_layer, x, stage_params)
        return x

    pipe = make_pipeline_forward(mesh, stage_fn,
                                 num_microbatches=num_microbatches)

    def forward(params, input_ids):
        layer_params = [params[f"layers_{i}"]
                        for i in range(cfg.num_hidden_layers)]
        stacked = stack_stage_params(layer_params, n_stages)
        x = model.module.apply({"params": params}, input_ids,
                               method=model.module.embed)
        x = pipe(stacked, x)
        # final norm + head (replicated epilogue)
        from .modeling import RMSNorm

        x = RMSNorm(cfg.rms_norm_eps, dtype=model.dtype).apply(
            {"params": params["norm"]}, x)
        if cfg.tie_word_embeddings:
            emb = params["embed_tokens"]["embedding"]
            return x.astype(model.dtype) @ emb.T.astype(model.dtype)
        from .modeling import MXUDense

        return MXUDense(cfg.vocab_size, use_bias=False,
                        dtype=model.dtype).apply(
            {"params": params["lm_head"]}, x)

    return forward


def make_llama_pipeline_loss(model: LlamaForCausalLM, *,
                             num_microbatches: int = 4):
    """Trainer-ready pipeline-parallel causal-LM loss.

    Returns a trainer.MeshAwareLoss: the Trainer builds the stage-axis mesh
    from ``TrainingArguments.pipeline_parallel_degree`` and binds this
    factory to it in ``setup()``, making PP reachable from the trainer/SFT
    surface (reference blip2_trainer.py:306-354 wires fleet pp the same
    way). Batches: {"input_ids", optional "labels" (-100 = ignore)}."""
    from ...trainer.trainer import MeshAwareLoss

    def factory(mesh):
        if mesh is None or mesh.shape.get("stage", 1) < 2:
            raise ValueError(
                "make_llama_pipeline_loss needs pipeline_parallel_degree >= 2")
        fwd = make_llama_pipeline_forward(model, mesh,
                                          num_microbatches=num_microbatches)

        def loss_fn(params, batch, rng=None):
            ids = batch["input_ids"]
            labels = batch.get("labels", ids)
            logits = fwd(params, ids)[:, :-1]
            tgt = labels[:, 1:]
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
            mask = (tgt != -100).astype(jnp.float32)
            return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        return loss_fn

    return MeshAwareLoss(factory)
