"""Audio-to-caption demo (reference applications/Audio2Caption: whisper ASR ->
LLM rewrite; reference README.md:90). Native stack: Whisper + a causal LM."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def load_audio(path):
    """Load a waveform: 16-bit PCM .wav via stdlib, or a saved .npy array."""
    if path.endswith(".npy"):
        wav = np.load(path)
        return np.asarray(wav, np.float32), 16000
    import wave

    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        pcm = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        if f.getnchannels() > 1:
            pcm = pcm.reshape(-1, f.getnchannels()).mean(axis=1)
    return pcm.astype(np.float32) / 32768.0, sr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", required=True, help=".wav (16-bit PCM) or .npy waveform")
    ap.add_argument("--asr-model", default=None, help="Whisper checkpoint dir")
    ap.add_argument("--llm", default=None, help="causal-LM checkpoint dir (caption rewrite)")
    ap.add_argument("--prompt", default="Describe this audio: {}",
                    help='template; "{}" is replaced by the transcript')
    args = ap.parse_args()

    wav, sr = load_audio(args.audio)
    llm = args.llm
    if llm is None:  # no rewrite LM: pass the transcript through
        llm = lambda text: text  # noqa: E731
    app = Appflow(app="audio2caption", models=[args.asr_model, llm])
    result = app(audio=wav, sampling_rate=sr, prompt=args.prompt)
    print(result["result"])


if __name__ == "__main__":
    main()
