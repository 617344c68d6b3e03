"""ImageBind multi-modal processing.

Rebuild of the reference's ImageBind processors (paddlemix/processors/
imagebind_processing.py:38-302): CLIP-style vision + text, plus audio as
uniformly-sampled clips -> kaldi log-mel filterbank spectrograms padded to a
fixed target length and normalized. Audio decode/feature extraction is pure
numpy (audio_utils.kaldi_fbank mirrors paddle.audio.fbank(htk_compat=True,
window_type='hanning', dither=0)); waveforms arrive as arrays or .wav paths
(stdlib ``wave``), never through a framework audio backend."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .audio_utils import constant_clips_timepoints, kaldi_fbank
from .base import BaseImageProcessor, ProcessorMixin
from .clip_processing import CLIPImageProcessor


def load_waveform(audio: Union[str, np.ndarray],
                  sample_rate: Optional[int] = None) -> Tuple[np.ndarray, int]:
    """-> (channels, samples) float32 in [-1, 1] and its sample rate."""
    if isinstance(audio, np.ndarray):
        wav = np.asarray(audio, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        return wav, sample_rate or 16000
    import wave

    with wave.open(audio, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        ch = f.getnchannels()
        raw = f.readframes(n)
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}[width]
    data = np.frombuffer(raw, dtype).astype(np.float32)
    data /= float(np.iinfo(dtype).max)
    return data.reshape(-1, ch).T, sr


def resample_waveform(wav: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Linear-interp resample (host-side; quality is ample for fbanks)."""
    if orig_sr == new_sr:
        return wav
    n_out = int(round(wav.shape[-1] * new_sr / orig_sr))
    t_out = np.arange(n_out) * (orig_sr / new_sr)
    idx = np.clip(t_out.astype(np.int64), 0, wav.shape[-1] - 2)
    frac = (t_out - idx).astype(np.float32)
    return wav[..., idx] * (1 - frac) + wav[..., idx + 1] * frac


@dataclasses.dataclass
class ImageBindAudioProcessor(BaseImageProcessor):
    """audio -> (clips_per_video, 1, num_mel_bins, target_length) batches
    (reference ImageBindAudioProcessor, imagebind_processing.py:82-199)."""

    model_type = "imagebind_audio_processor"
    num_mel_bins: int = 128
    target_length: int = 204
    sample_rate: int = 16000
    clip_duration: float = 2.0
    clips_per_video: int = 3
    mean: float = -4.268
    std: float = 9.138

    def waveform2melspec(self, waveform: np.ndarray) -> np.ndarray:
        """(C, T) clip -> (1, num_mel_bins, target_length)
        (reference imagebind_processing.py:165-199: fbank, transpose,
        pad/truncate frames to target_length)."""
        wav = waveform - waveform.mean()
        mono = wav.mean(axis=0) if wav.ndim == 2 else wav
        fb = kaldi_fbank(mono, self.sample_rate, self.num_mel_bins)  # (T', M)
        fb = fb.T  # (M, T')
        p = self.target_length - fb.shape[1]
        if p > 0:
            fb = np.pad(fb, ((0, 0), (0, p)))
        elif p < 0:
            fb = fb[:, : self.target_length]
        return fb[None]

    def __call__(self, audios, sample_rate: Optional[int] = None) -> Dict[str, np.ndarray]:
        if not isinstance(audios, (list, tuple)):
            audios = [audios]
        out = []
        for audio in audios:
            wav, sr = load_waveform(audio, sample_rate)
            wav = resample_waveform(wav, sr, self.sample_rate)
            duration = wav.shape[-1] / self.sample_rate
            clips = []
            for (t0, t1) in constant_clips_timepoints(
                    duration, self.clip_duration, self.clips_per_video):
                clip = wav[:, int(t0 * self.sample_rate):
                           int(t1 * self.sample_rate)]
                spec = self.waveform2melspec(clip)
                clips.append((spec - self.mean) / self.std)
            out.append(np.stack(clips))
        return {"audio_values": np.stack(out).astype(np.float32)}


class ImageBindProcessor(ProcessorMixin):
    """text/images/audios -> model inputs (reference ImageBindProcessor,
    imagebind_processing.py:38-80)."""

    image_processor_class = CLIPImageProcessor

    def __init__(self, image_processor=None, tokenizer=None,
                 audio_processor=None, **kw):
        super().__init__(
            image_processor=image_processor or CLIPImageProcessor(),
            tokenizer=tokenizer,
            audio_processor=audio_processor or ImageBindAudioProcessor(), **kw)

    def __call__(self, text=None, images=None, audios=None,
                 sample_rate: Optional[int] = None, **kwargs):
        enc: Dict[str, np.ndarray] = {}
        if text is not None and self.tokenizer is not None:
            enc.update(self.tokenizer(text, **kwargs))
        if images is not None:
            enc.update(self.image_processor(images))
        if audios is not None:
            enc.update(self.audio_processor(audios, sample_rate=sample_rate))
        return enc
