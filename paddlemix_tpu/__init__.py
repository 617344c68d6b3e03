"""paddlemix_tpu: a TPU-native multimodal framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of PaddlePaddle/PaddleMIX
(understanding suite + ppdiffusers generation suite) designed for TPU:
one device mesh replaces fleet hybrid parallel, Pallas kernels replace
Triton/CUDA custom ops, jit-AOT replaces static-graph deployment.

Layout (mirrors SURVEY.md §2's component inventory):
  core/        config system, model base (safetensors io, torch conversion)
  ops/         Pallas kernels + XLA fallbacks (flash attention, fused norms,
               adaLN, rope/M-RoPE, wint8 matmul)
  parallel/    device mesh, sharding rules (DP/FSDP/TP/SP)
  models/      understanding zoo: CLIP, BLIP-2 (+OPT, Q-Former), LLaVA,
               Llama/Qwen2, Qwen2-VL
  diffusers/   generation suite: UNet/VAE/DiT/SD3 models, schedulers,
               SD/SDXL/SD3/DiT pipelines
  processors/  image/video preprocessing (CLIP, Qwen2-VL smart_resize,
               InternVL dynamic tiling)
  datasets/    dataset registry, MixToken packing, collators, dataloader
  trainer/     pjit Trainer, train state, EMA, arguments
  peft/        LoRA (merge-on-the-fly)
  metrics/     CLIP zero-shot eval
  appflow/     task pipelines (Appflow)
  datacopilot/ dataset ops toolkit (MMDataset)
"""

__version__ = "0.1.0"

from .core.config import BaseConfig
from .core.modeling import PretrainedModel
from .core.outputs import BaseOutput
from .parallel.mesh import MeshConfig, create_mesh
from .utils.log import logger
