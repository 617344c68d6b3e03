"""Kernel layer: Pallas TPU kernels with XLA fallbacks.

Mirrors the surface of the reference's kernel layer (paddlemix/triton_ops,
paddlemix/external_ops, SDPA dispatch in ppdiffusers/patches/paddle_patch.py)
re-designed for TPU — see each module's docstring for the mapping.
"""

from .activations import ACT2FN, get_activation
from .attention import (
    SegmentIds,
    attention_xla,
    flash_attention,
    scaled_dot_product_attention,
)
from .norms import (
    adaptive_layer_norm,
    fused_adaln_scale_residual,
    layer_norm,
    rms_norm,
)
from .decode_attention import decode_attention, decode_attention_xla
from .ms_deform_attn import ms_deform_attn
from .quant import quantize_weights_int8, wint8_matmul
from .rope import apply_rope, apply_rope_gptj, mrope_cos_sin, rope_cos_sin
