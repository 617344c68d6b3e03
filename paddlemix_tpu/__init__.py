"""paddlemix_tpu: a TPU-native multimodal framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of PaddlePaddle/PaddleMIX
(understanding suite + ppdiffusers generation suite) designed for TPU:
one device mesh replaces fleet hybrid parallel, Pallas kernels replace
Triton/CUDA custom ops, jit-AOT replaces static-graph deployment.
"""

__version__ = "0.1.0"

from .core.config import BaseConfig
from .core.modeling import PretrainedModel
from .core.outputs import BaseOutput
from .parallel.mesh import MeshConfig, create_mesh
from .utils.log import logger
