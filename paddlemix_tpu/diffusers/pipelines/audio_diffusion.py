"""Audio diffusion (reference ppdiffusers/pipelines/audio_diffusion +
deprecated mel.py): images ARE mel spectrograms; an unconditional UNet (or
VQ-VAE latent variant) denoises them and the Mel processor converts
spectrogram <-> waveform. The reference wraps librosa; here the mel filter
bank, STFT and Griffin-Lim are small numpy routines (librosa-free)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pipeline_utils import DiffusionPipeline, register_pipeline
from .stable_diffusion import _JitCache


def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


class Mel:
    """Waveform <-> log-mel-spectrogram image (reference mel.py Mel)."""

    def __init__(self, x_res: int = 256, y_res: int = 256,
                 sample_rate: int = 22050, n_fft: int = 2048,
                 hop_length: int = 512, top_db: float = 80.0):
        self.x_res, self.y_res = x_res, y_res
        self.sr = sample_rate
        self.n_fft = n_fft
        self.hop = hop_length
        self.top_db = top_db
        self.slice_len = self.x_res * self.hop - 1
        # mel filter bank (Slaney-style triangle filters)
        mels = np.linspace(_hz_to_mel(0), _hz_to_mel(sample_rate / 2), y_res + 2)
        hz = _mel_to_hz(mels)
        bins = np.floor((n_fft + 1) * hz / sample_rate).astype(int)
        fb = np.zeros((y_res, n_fft // 2 + 1), np.float32)
        for i in range(y_res):
            l, c, r = bins[i], bins[i + 1], bins[i + 2]
            if c > l:
                fb[i, l:c] = (np.arange(l, c) - l) / max(c - l, 1)
            if r > c:
                fb[i, c:r] = (r - np.arange(c, r)) / max(r - c, 1)
        self.fb = fb

    def _stft(self, y):
        win = np.hanning(self.n_fft).astype(np.float32)
        pad = self.n_fft // 2
        y = np.pad(y, pad, mode="reflect")
        frames = 1 + (len(y) - self.n_fft) // self.hop
        idx = (np.arange(self.n_fft)[None, :] +
               self.hop * np.arange(frames)[:, None])
        return np.fft.rfft(y[idx] * win[None, :], axis=1)  # (T, F)

    def spectrogram(self, audio: np.ndarray) -> np.ndarray:
        """waveform -> (y_res, x_res) image in [0, 255]."""
        audio = np.asarray(audio, np.float32)[: self.slice_len]
        if len(audio) < self.slice_len:
            audio = np.pad(audio, (0, self.slice_len - len(audio)))
        power = np.abs(self._stft(audio)) ** 2                  # (T, F)
        mel = power @ self.fb.T                                 # (T, M)
        db = 10.0 * np.log10(np.maximum(mel, 1e-10))
        db = np.clip(db - db.max(), -self.top_db, 0.0)
        img = (db / self.top_db + 1.0) * 255.0                  # [0, 255]
        return img.T[:, : self.x_res].astype(np.uint8)

    def image_to_audio(self, image: np.ndarray, n_iter: int = 32) -> np.ndarray:
        """(y_res, x_res) image -> waveform via Griffin-Lim."""
        db = (np.asarray(image, np.float32) / 255.0 - 1.0) * self.top_db
        mel = 10.0 ** (db / 10.0)                               # (M, T)
        # mel -> linear power (pseudo-inverse of the filter bank)
        power = np.maximum(np.linalg.pinv(self.fb) @ mel, 0.0)  # (F, T)
        mag = np.sqrt(power)
        angles = np.exp(2j * np.pi * np.random.RandomState(0).rand(*mag.shape))
        win = np.hanning(self.n_fft).astype(np.float32)
        length = self.hop * (mag.shape[1] - 1) + self.n_fft

        def istft(spec):
            frames = np.fft.irfft(spec, n=self.n_fft, axis=0) * win[:, None]
            y = np.zeros(length, np.float32)
            norm = np.zeros(length, np.float32)
            for t in range(frames.shape[1]):
                y[t * self.hop: t * self.hop + self.n_fft] += frames[:, t]
                norm[t * self.hop: t * self.hop + self.n_fft] += win ** 2
            return y / np.maximum(norm, 1e-8)

        for _ in range(n_iter):
            y = istft(mag * angles)
            spec = self._stft(y).T  # (F, T)
            spec = spec[:, : mag.shape[1]]
            angles = np.exp(1j * np.angle(spec))
        return istft(mag * angles)


@register_pipeline
class AudioDiffusionPipeline(DiffusionPipeline):
    """Unconditional mel-spectrogram diffusion -> Griffin-Lim waveform
    (reference pipeline_audio_diffusion.py)."""

    def __init__(self, unet, scheduler, mel: Optional[Mel] = None, vqvae=None):
        self.register_modules(unet=unet, scheduler=scheduler, vqvae=vqvae)
        self.mel = mel or Mel(x_res=unet.config.sample_size,
                              y_res=unet.config.sample_size)
        self._jit = _JitCache()

    def __call__(self, batch_size: int = 1, num_inference_steps: int = 50,
                 seed: int = 0, return_audio: bool = True):
        s = self.unet.config.sample_size
        lat_ch = self.unet.config.in_channels
        shape = (batch_size, s, s, lat_ch)
        key = jax.random.PRNGKey(seed)
        key, sub = jax.random.split(key)
        sample = jax.random.normal(sub, shape, jnp.float32)
        state = self.scheduler.set_timesteps(num_inference_steps)
        unet, scheduler = self.unet, self.scheduler
        d = unet.config.cross_attention_dim
        ctx = jnp.zeros((batch_size, 1, d if isinstance(d, int) else d[0]))

        def build():
            def run(params, sample, state, key):
                def body(i, carry):
                    sample, state, key = carry
                    key, sub = jax.random.split(key)
                    t = state.timesteps[i]
                    eps = unet.module.apply({"params": params},
                                            sample.astype(unet.dtype), t,
                                            ctx.astype(unet.dtype)).astype(jnp.float32)
                    sample, state = scheduler.step(state, eps, i, sample, key=sub)
                    return sample, state, key

                out, _, _ = jax.lax.fori_loop(0, num_inference_steps, body,
                                              (sample, state, key))
                return out

            return jax.jit(run)

        out = self._jit.get(("audio", shape, num_inference_steps), build)(
            self.unet.params, sample, state, key)
        if self.vqvae is not None:
            out = self.vqvae.decode(out.astype(self.vqvae.dtype)).astype(jnp.float32)
        images = np.asarray(jnp.clip(out / 2 + 0.5, 0, 1) * 255).astype(np.uint8)
        images = images[..., 0]  # (B, H, W)
        if not return_audio:
            return (images,)
        audios = [self.mel.image_to_audio(img, n_iter=8) for img in images]
        return (images, np.stack(audios))
