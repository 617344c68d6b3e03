"""TrainingArguments (reference paddlemix/trainer/argument.py:24-31 +
PaddleNLP TrainingArguments surface used by the SFT shells: sharding/tp/sep
degrees, bf16, warmup, benchmark flags)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from ..core.config import BaseConfig


@dataclasses.dataclass
class TrainingArguments(BaseConfig):
    model_type = "training_args"
    output_dir: str = "output"
    per_device_train_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    learning_rate: float = 1e-4
    lr_scheduler_type: str = "cosine"
    warmup_steps: int = 0
    weight_decay: float = 0.0
    layer_decay: Optional[float] = None  # <1.0 enables per-layer LR decay
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    num_train_epochs: int = 1
    max_steps: int = -1
    logging_steps: int = 10
    save_steps: int = 500
    save_total_limit: Optional[int] = None
    seed: int = 42
    bf16: bool = True
    # mesh degrees (reference: dp/sharding/mp/sep degrees, utils/env.py:106-143)
    data_parallel_degree: int = -1
    fsdp_parallel_degree: int = 1   # reference: sharding_parallel_degree
    tensor_parallel_degree: int = 1
    sequence_parallel_degree: int = 1  # reference: sep_parallel_degree
    pipeline_parallel_degree: int = 1  # reference: pp_degree (blip2_trainer.py:306-354)
    expert_parallel_degree: int = 1    # MoE expert axis (parallel/moe.py)
    # input pipeline (reference: paddle DataLoader num_workers; here a thread
    # pool in datasets.DataLoader + device put-ahead in the train loop)
    dataloader_num_workers: int = 4
    prefetch_depth: int = 2
    # telemetry (reference: benchmark/profiler_options flags)
    benchmark: bool = False
    profiler_options: Optional[str] = None
    report_to: str = "none"  # none | tensorboard
    resume_from_checkpoint: Optional[str] = None
    # evaluation (reference: do_eval/evaluation_strategy/metric_for_best_model)
    do_eval: bool = False
    eval_steps: int = 0            # 0 = eval at end of training only
    per_device_eval_batch_size: int = 8
    metric_for_best_model: str = "loss"
    greater_is_better: bool = False
