"""Llama-family decoder config (covers Llama 1/2/3, Vicuna, Qwen2 via
attention_bias, TinyLlama). HF config.json compatible.

Replaces the PaddleNLP LLM backbone configs the reference depends on
(SURVEY.md L0: PaddleNLP Llama/Qwen2 used by LLaVA/Qwen-VL/InternVL2)."""

from __future__ import annotations

import dataclasses
from typing import Optional

from ...core.config import BaseConfig


@dataclasses.dataclass
class LlamaConfig(BaseConfig):
    model_type = "llama"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: Optional[int] = None
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    hidden_act: str = "silu"
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # True for Qwen2
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: Optional[int] = None
    # weight-only quantization of the Dense layers: None | "wint8"
    # (set via LlamaForCausalLM.quantize_(); params must hold kernel_q/scale)
    quant: Optional[str] = None
    # fuse q/k/v and gate/up into single matmuls: fewer, larger weight
    # streams — the decode profile shows per-tensor DMA latency gaps
    # (slice-done waits) costing ~4 ms/token on 7B a8w8 decode
    fused_qkv: bool = False
    # lax.scan over the decoder stack (stacked (L, ...) weights): one traced
    # layer instead of num_hidden_layers copies — compile time drops ~L-fold
    # at 7B scale, and the per-layer weight reads become one regular strided
    # stream. Opt-in; dense KV cache only (no paged cache under scan).
    scan_layers: bool = False
    # int8 KV cache with per-(token, head) scales (reference deploy
    # --cachekv_int8): halves decode cache-read bytes at long context
    cachekv_int8: bool = False
    # rematerialize each decoder layer's activations in backward (reference
    # `recompute` / torch gradient_checkpointing): trades ~30% step FLOPs for
    # O(L) -> O(1) layer-activation memory. jax.checkpoint under the hood.
    gradient_checkpointing: bool = False

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads
