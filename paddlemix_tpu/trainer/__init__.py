from .arguments import TrainingArguments
from .callbacks import BenchmarkCallback, ProfilerCallback, TensorBoardCallback, parse_profiler_options
from .ema import EMAState, ema_init, ema_update
from .train_state import (
    TrainState,
    create_train_state,
    make_train_step,
    shard_batch,
    shard_train_state,
)
from .trainer import Trainer, get_trainer
