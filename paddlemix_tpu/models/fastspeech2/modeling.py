"""FastSpeech2: non-autoregressive text-to-speech (mel) + Griffin-Lim vocoder.

TPU-native TTS filling the reference's AudioChat speech-synthesis slot: the
reference delegates to paddlespeech's fastspeech2_csmsc + pwgan executors
(reference paddlemix/appflow/text2speech_synthesize.py:62-66, am default
"fastspeech2_csmsc"). Here the acoustic model is first-class and fully
jitted: phoneme-embedding FFT encoder, variance adaptor (duration/pitch/
energy predictors + a gather-based length regulator that stays static-shape
under jit), FFT mel decoder with postnet. The vocoder is Griffin-Lim on the
host (a classical phase-recovery loop; the reference's pwgan GAN vocoder has
no trained weights offline — the mel contract is identical so one can swap
vocoders freely).

FastSpeech2 spec: Ren et al. 2021; paddlespeech t2s fastspeech2 uses
phoneme-level (token-averaged) pitch/energy, which this follows.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from ...ops import scaled_dot_product_attention


@dataclasses.dataclass
class FastSpeech2Config(BaseConfig):
    model_type = "fastspeech2"
    vocab_size: int = 100          # phoneme inventory
    hidden_size: int = 256         # adim
    num_attention_heads: int = 2
    encoder_layers: int = 4
    decoder_layers: int = 4
    ffn_kernel: int = 9            # FFT conv-FFN kernel
    ffn_filters: int = 1024
    num_mels: int = 80
    max_mel_len: int = 1000        # static decode length under jit
    layer_norm_eps: float = 1e-5
    max_duration: int = 50         # clamp for predicted per-phoneme frames


class FFTBlock(nn.Module):
    """FastSpeech FFT: post-LN self-attention + 2x conv1d FFN (k, 1)."""

    config: FastSpeech2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        cfg = self.config
        d = cfg.hidden_size
        nh = cfg.num_attention_heads
        b, s = x.shape[:2]
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x).reshape(b, s, nh, d // nh)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x).reshape(b, s, nh, d // nh)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x).reshape(b, s, nh, d // nh)
        bias = None
        if mask is not None:  # (B, S) True = valid
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e9)
        o = scaled_dot_product_attention(q, k, v, bias=bias).reshape(b, s, d)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="attn_norm")(x + nn.Dense(d, dtype=self.dtype,
                                                        name="out_proj")(o))
        h = nn.Conv(cfg.ffn_filters, (cfg.ffn_kernel,), padding="SAME",
                    dtype=self.dtype, name="conv1")(x)
        h = nn.Conv(d, (1,), dtype=self.dtype, name="conv2")(nn.relu(h))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="ffn_norm")(x + h)
        if mask is not None:
            x = x * mask[:, :, None].astype(x.dtype)
        return x


class VariancePredictor(nn.Module):
    """conv1d(k3)-relu-LN -> conv1d(k3)-relu-LN -> linear(1)."""

    config: FastSpeech2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.relu(nn.Conv(cfg.hidden_size, (3,), padding="SAME",
                            dtype=self.dtype, name="conv1")(x))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm1")(h)
        h = nn.relu(nn.Conv(cfg.hidden_size, (3,), padding="SAME",
                            dtype=self.dtype, name="conv2")(h))
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="norm2")(h)
        return nn.Dense(1, dtype=self.dtype, name="out")(h)[..., 0]


def length_regulate(x, durations, max_len: int):
    """Expand phoneme states to frames by integer durations — static-shape:
    frame t gathers phoneme argmax{i: cumsum(dur)[i] > t}. Returns
    (frames, frame_mask)."""
    cum = jnp.cumsum(durations, axis=-1)                      # (B, T)
    t = jnp.arange(max_len)[None, :]                          # (1, L)
    # index of the phoneme covering frame t = #(cum <= t)
    idx = jnp.sum((cum[:, None, :] <= t[:, :, None]).astype(jnp.int32), axis=-1)
    total = cum[:, -1]
    mask = t < total[:, None]
    idx = jnp.minimum(idx, x.shape[1] - 1)
    frames = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    return frames * mask[:, :, None].astype(x.dtype), mask


class Postnet(nn.Module):
    config: FastSpeech2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel):
        cfg = self.config
        h = mel
        for i in range(4):
            h = jnp.tanh(nn.Conv(256, (5,), padding="SAME", dtype=self.dtype,
                                 name=f"conv{i}")(h))
        return nn.Conv(cfg.num_mels, (5,), padding="SAME", dtype=self.dtype,
                       name="conv4")(h)


class FastSpeech2Module(nn.Module):
    config: FastSpeech2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.embed = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype)
        self.enc_layers = [FFTBlock(cfg, dtype=self.dtype, name=f"enc_{i}")
                           for i in range(cfg.encoder_layers)]
        self.duration_predictor = VariancePredictor(cfg, dtype=self.dtype)
        self.pitch_predictor = VariancePredictor(cfg, dtype=self.dtype)
        self.energy_predictor = VariancePredictor(cfg, dtype=self.dtype)
        self.pitch_embed = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        self.energy_embed = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        self.dec_layers = [FFTBlock(cfg, dtype=self.dtype, name=f"dec_{i}")
                           for i in range(cfg.decoder_layers)]
        self.mel_out = nn.Dense(cfg.num_mels, dtype=self.dtype)
        self.postnet = Postnet(cfg, dtype=self.dtype)

    def _sinusoid(self, s):
        d = self.config.hidden_size
        inv = np.exp(-np.log(10000.0) / (d // 2) * np.arange(d // 2))
        ang = np.arange(s)[:, None] * inv[None, :]
        return jnp.asarray(np.concatenate([np.sin(ang), np.cos(ang)], 1),
                           jnp.float32)

    def encode(self, phoneme_ids, mask=None):
        x = self.embed(phoneme_ids)
        x = x + self._sinusoid(x.shape[1])[None].astype(x.dtype)
        for blk in self.enc_layers:
            x = blk(x, mask)
        return x

    def decode_mel(self, frames, frame_mask):
        x = frames + self._sinusoid(frames.shape[1])[None].astype(frames.dtype)
        for blk in self.dec_layers:
            x = blk(x, frame_mask)
        mel = self.mel_out(x)
        mel = mel + self.postnet(mel)
        return mel * frame_mask[:, :, None].astype(mel.dtype)

    def __call__(self, phoneme_ids, durations=None, pitch=None, energy=None,
                 phoneme_mask=None):
        """Training mode when teacher durations/pitch/energy are given;
        inference (predicted variances) otherwise. Returns
        (mel, frame_mask, predictions dict)."""
        cfg = self.config
        if phoneme_mask is None:
            phoneme_mask = phoneme_ids > 0
        x = self.encode(phoneme_ids, phoneme_mask)
        log_dur_pred = self.duration_predictor(x)
        pitch_pred = self.pitch_predictor(x)
        energy_pred = self.energy_predictor(x)
        if durations is None:
            durations = jnp.clip(
                jnp.round(jnp.exp(log_dur_pred) - 1.0), 0,
                cfg.max_duration).astype(jnp.int32)
            durations = durations * phoneme_mask.astype(jnp.int32)
        if pitch is None:
            pitch = pitch_pred
        if energy is None:
            energy = energy_pred
        x = x + self.pitch_embed(pitch[..., None]).astype(x.dtype)
        x = x + self.energy_embed(energy[..., None]).astype(x.dtype)
        frames, frame_mask = length_regulate(x, durations, cfg.max_mel_len)
        mel = self.decode_mel(frames, frame_mask)
        return mel, frame_mask, {"log_duration": log_dur_pred,
                                 "pitch": pitch_pred, "energy": energy_pred}


class FastSpeech2Model(PretrainedModel):
    config_class = FastSpeech2Config
    module_class = FastSpeech2Module

    @classmethod
    def example_inputs(cls, config):
        return ((jnp.ones((1, 4), jnp.int32),), {})

    def synthesize(self, phoneme_ids):
        """(B, T) ids -> (B, max_mel_len, n_mels) mel + frame mask."""
        mel, mask, _ = self.module.apply({"params": self.params},
                                         jnp.asarray(phoneme_ids, jnp.int32))
        return mel, mask


def fastspeech2_loss(outputs, mel_target, dur_target, pitch_target,
                     energy_target, phoneme_mask, frame_mask):
    """L1 mel + MSE(log-duration, pitch, energy) (FastSpeech2 eq. 1)."""
    mel, _, preds = outputs
    fm = frame_mask[:, :, None].astype(jnp.float32)
    mel_l1 = jnp.sum(jnp.abs(mel - mel_target) * fm) / jnp.maximum(fm.sum(), 1)
    pm = phoneme_mask.astype(jnp.float32)
    log_dt = jnp.log(dur_target.astype(jnp.float32) + 1.0)
    dur = jnp.sum((preds["log_duration"] - log_dt) ** 2 * pm) / jnp.maximum(pm.sum(), 1)
    pit = jnp.sum((preds["pitch"] - pitch_target) ** 2 * pm) / jnp.maximum(pm.sum(), 1)
    en = jnp.sum((preds["energy"] - energy_target) ** 2 * pm) / jnp.maximum(pm.sum(), 1)
    return mel_l1 + dur + pit + en


def griffin_lim(mel: np.ndarray, mel_fb: np.ndarray, n_fft: int = 1024,
                hop: int = 256, n_iter: int = 32, power: float = 1.2
                ) -> np.ndarray:
    """Host-side phase recovery: mel (T, M) -> waveform. mel_fb is the
    (n_freqs, M) filterbank used to produce the mel (pseudo-inverted here)."""
    if mel_fb.shape[0] != n_fft // 2 + 1:          # accept (M, F) too
        mel_fb = mel_fb.T
    # pinv(mel_fb): (M, F) — lifts mel back to the linear spectrum
    spec = np.maximum(np.exp(mel) @ np.linalg.pinv(mel_fb.astype(np.float64)),
                      1e-10) ** power
    spec = spec.T                                   # (F, T)
    angles = np.exp(2j * np.pi * np.random.RandomState(0).rand(*spec.shape))
    win = np.hanning(n_fft + 1)[:-1]

    def istft(S):
        frames = np.fft.irfft(S, n=n_fft, axis=0)   # (n_fft, T)
        T = S.shape[1]
        out = np.zeros((T - 1) * hop + n_fft)
        norm = np.zeros_like(out)
        for t in range(T):
            out[t * hop: t * hop + n_fft] += frames[:, t] * win
            norm[t * hop: t * hop + n_fft] += win ** 2
        return out / np.maximum(norm, 1e-8)

    def stft(x):
        T = (len(x) - n_fft) // hop + 1
        idx = np.arange(n_fft)[:, None] + hop * np.arange(T)[None, :]
        return np.fft.rfft(x[idx] * win[:, None], n=n_fft, axis=0)

    for _ in range(n_iter):
        wav = istft(spec * angles)
        re = stft(wav)
        angles = re / np.maximum(np.abs(re), 1e-8)
    return istft(spec * angles).astype(np.float32)
