"""Whisper log-mel feature extraction.

Numpy twin of transformers' WhisperFeatureExtractor (the spec the openai
checkpoints were trained on): pad/trim to 30 s @ 16 kHz, centered STFT
(n_fft=400, hop=160, periodic Hann, reflect pad), power spectrum through an
80-bin slaney-scale/slaney-norm mel filterbank, log10 clamped to
(max - 8), scaled (x + 4) / 4. Output here is (frames, n_mels) — the NWC
layout WhisperEncoder consumes (HF emits the transpose)."""

from __future__ import annotations

import numpy as np

from .audio_utils import hz_to_mel, mel_to_hz


def slaney_mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                          f_min: float = 0.0, f_max: float | None = None
                          ) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank, slaney scale + slaney area
    normalization (librosa default; what Whisper uses)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min, htk=False), hz_to_mel(f_max, htk=False),
                        n_mels + 2)
    f_pts = mel_to_hz(m_pts, htk=False)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    # slaney normalization: scale each filter by 2 / bandwidth
    enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
    return (fb * enorm[None, :]).astype(np.float32)


class WhisperProcessor:
    """wav (float32, any length) -> (frames, n_mels) log-mel features."""

    def __init__(self, sampling_rate: int = 16000, n_fft: int = 400,
                 hop_length: int = 160, n_mels: int = 80,
                 chunk_length_s: float = 30.0):
        self.sampling_rate = sampling_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.n_samples = int(chunk_length_s * sampling_rate)
        # periodic Hann (torch.hann_window / HF window_function default)
        n = np.arange(n_fft)
        self.window = (0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))).astype(
            np.float64)
        self.mel_fb = slaney_mel_filterbank(n_fft // 2 + 1, n_mels,
                                            sampling_rate, f_max=8000.0)

    def __call__(self, waveform: np.ndarray, sampling_rate: int | None = None
                 ) -> np.ndarray:
        if sampling_rate is not None and sampling_rate != self.sampling_rate:
            raise ValueError(
                f"expected {self.sampling_rate} Hz audio, got {sampling_rate}; "
                "resample on the host first")
        wav = np.asarray(waveform, np.float64).reshape(-1)
        if len(wav) >= self.n_samples:
            wav = wav[: self.n_samples]
        else:
            wav = np.pad(wav, (0, self.n_samples - len(wav)))
        # centered STFT: reflect-pad n_fft//2, frame at hop, windowed rFFT
        pad = self.n_fft // 2
        wav = np.pad(wav, (pad, pad), mode="reflect")
        n_frames = 1 + (len(wav) - self.n_fft) // self.hop_length
        idx = (np.arange(self.n_fft)[None, :]
               + self.hop_length * np.arange(n_frames)[:, None])
        frames = wav[idx] * self.window[None, :]
        spec = np.abs(np.fft.rfft(frames, n=self.n_fft, axis=1)) ** 2
        spec = spec[:-1]                                # drop the tail frame
        mel = spec @ self.mel_fb
        log_spec = np.log10(np.maximum(mel, 1e-10))
        log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
        return (((log_spec + 4.0) / 4.0)).astype(np.float32)
