"""AudioLDM2 projection model (reference
pipelines/audioldm2/modeling_audioldm2.py:78-143): per-encoder linear
projection into GPT-2 space with learned SOS/EOS vectors framing each
sequence, then concatenation."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel


@dataclasses.dataclass
class AudioLDM2ProjectionConfig(BaseConfig):
    model_type = "audioldm2-projection"
    text_encoder_dim: int = 512      # CLAP projection_dim
    text_encoder_1_dim: int = 1024   # T5 hidden
    langauge_model_dim: int = 768    # GPT-2 n_embd (reference's spelling)


class AudioLDM2ProjectionModule(nn.Module):
    config: AudioLDM2ProjectionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, hidden_states_1):
        cfg = self.config
        d = cfg.langauge_model_dim
        sos = self.param("sos_embed", nn.initializers.ones, (d,))
        eos = self.param("eos_embed", nn.initializers.ones, (d,))
        sos1 = self.param("sos_embed_1", nn.initializers.ones, (d,))
        eos1 = self.param("eos_embed_1", nn.initializers.ones, (d,))

        def frame(h, s, e):
            b = h.shape[0]
            s = jnp.broadcast_to(s.astype(h.dtype)[None, None], (b, 1, d))
            e = jnp.broadcast_to(e.astype(h.dtype)[None, None], (b, 1, d))
            return jnp.concatenate([s, h, e], axis=1)

        h0 = nn.Dense(d, dtype=self.dtype, name="projection")(hidden_states)
        h1 = nn.Dense(d, dtype=self.dtype, name="projection_1")(hidden_states_1)
        return jnp.concatenate([frame(h0, sos, eos), frame(h1, sos1, eos1)], axis=1)


class AudioLDM2ProjectionModel(PretrainedModel):
    config_class = AudioLDM2ProjectionConfig
    module_class = AudioLDM2ProjectionModule

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.zeros((1, 1, config.text_encoder_dim)),
                 jnp.zeros((1, 4, config.text_encoder_1_dim))), {})
