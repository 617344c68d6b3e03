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
    # QWen-v1 long-context options (the reference Qwen-VL LLM backbone lives
    # in PaddleNLP's QWen: NTK-aware rope + logn attention scaling).
    # NTK: theta_eff = rope_theta * alpha^(hd/(hd-2)); QWen's dynamic variant
    # picks alpha = 2^ceil(log2(ctx/seq_length)+1) - 1 per context length —
    # static shapes on TPU mean the caller computes alpha once from the
    # compiled max context (ntk_alpha_for()).
    rope_ntk_alpha: float = 1.0
    # logn scaling: q at position i (1-based) is scaled by
    # max(log(i)/log(logn_seq_length), 1) — extrapolation damping past the
    # train length.
    use_logn_attn: bool = False
    logn_seq_length: int = 2048

    def ntk_alpha_for(self, context_length: int) -> float:
        """QWen dynamic-NTK alpha for a given (static) max context."""
        import math

        ratio = max(context_length / self.logn_seq_length, 1.0)
        return max(2 ** math.ceil(math.log2(ratio) + 1) - 1, 1.0)

    @property
    def kv_heads(self) -> int:
        return self.num_key_value_heads or self.num_attention_heads

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads
