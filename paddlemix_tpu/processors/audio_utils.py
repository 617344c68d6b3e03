"""Host-side audio feature extraction (numpy).

Rebuild of the reference's audio preprocessing, which leans on
paddle.audio.fbank (kaldi-compatible log-mel filterbanks; used by
paddlemix/processors/imagebind_processing.py:165-197) and on torchaudio-style
mel spectrograms in the audio pipelines. Host preprocessing stays in numpy —
feature tensors ship to the TPU as ready NHWC batches.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def hz_to_mel(f, htk: bool = True):
    f = np.asarray(f, np.float64)
    if htk:
        return 1127.0 * np.log(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mel)


def mel_to_hz(m, htk: bool = True):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (np.exp(m / 1127.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: float | None = None,
                   htk: bool = True) -> np.ndarray:
    """(n_freqs, n_mels) triangular mel filterbank."""
    f_max = f_max or sample_rate / 2.0
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min, htk), hz_to_mel(f_max, htk), n_mels + 2)
    f_pts = mel_to_hz(m_pts, htk)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def frame_signal(waveform: np.ndarray, frame_length: int, frame_shift: int,
                 snip_edges: bool = True) -> np.ndarray:
    """(T,) -> (n_frames, frame_length) via strided view (copied)."""
    if snip_edges:
        n = 1 + (len(waveform) - frame_length) // frame_shift if \
            len(waveform) >= frame_length else 0
    else:
        n = (len(waveform) + frame_shift // 2) // frame_shift
        pad = (n - 1) * frame_shift + frame_length - len(waveform)
        if pad > 0:
            waveform = np.pad(waveform, (0, pad), mode="reflect")
    idx = (np.arange(frame_length)[None, :]
           + frame_shift * np.arange(n)[:, None])
    return waveform[idx]


def kaldi_fbank(waveform: np.ndarray, sample_rate: int = 16000,
                num_mel_bins: int = 128, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, window: str = "hanning",
                remove_dc: bool = True, preemphasis: float = 0.97,
                use_log: bool = True) -> np.ndarray:
    """Kaldi-compatible log-mel filterbank (HTK mel scale, as the reference's
    paddle.audio.fbank(htk_compat=True, window_type='hanning') call).
    waveform: (T,) float. Returns (n_frames, num_mel_bins) float32."""
    waveform = np.asarray(waveform, np.float64)
    frame_length = int(sample_rate * frame_length_ms / 1000.0)
    frame_shift = int(sample_rate * frame_shift_ms / 1000.0)
    frames = frame_signal(waveform, frame_length, frame_shift)
    if frames.shape[0] == 0:
        return np.zeros((0, num_mel_bins), np.float32)
    if remove_dc:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemphasis:
        pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemphasis * pre
    if window == "hanning":
        win = np.hanning(frame_length)
    elif window == "povey":
        win = np.hanning(frame_length) ** 0.85
    else:
        win = np.ones(frame_length)
    frames = frames * win
    n_fft = 1 << (frame_length - 1).bit_length()
    spec = np.fft.rfft(frames, n=n_fft)
    power = np.abs(spec) ** 2
    fb = mel_filterbank(n_fft // 2 + 1, num_mel_bins, sample_rate,
                        f_min=20.0, htk=True)
    mel = power @ fb
    if use_log:
        mel = np.log(np.maximum(mel, np.finfo(np.float32).eps))
    return mel.astype(np.float32)


def constant_clips_timepoints(duration: float, clip_duration: float,
                              clips_per_video: int) -> List[Tuple[float, float]]:
    """Reference ConstantClipsPerVideoSampler (imagebind_processing.py:250):
    uniformly spaced fixed-length clips over [0, duration]."""
    max_start = max(duration - clip_duration, 0.0)
    starts = np.linspace(0, max_start, clips_per_video)
    return [(float(s), float(s + clip_duration)) for s in starts]
