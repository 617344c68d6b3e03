"""Audio chat demo (reference applications/AudioChat: whisper ASR -> LLM reply
-> fastspeech2 TTS; reference README.md:91). Native stack: Whisper +
causal LM + FastSpeech2/Griffin-Lim — the full speech round trip."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from audio2caption import load_audio  # noqa: E402

from paddlemix_tpu.appflow import Appflow  # noqa: E402


def save_wav(path, wav, sr):
    import wave

    pcm = np.clip(np.asarray(wav, np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio", required=True, help=".wav (16-bit PCM) or .npy waveform")
    ap.add_argument("--asr-model", default=None, help="Whisper checkpoint dir")
    ap.add_argument("--llm", default=None, help="causal-LM checkpoint dir (chat reply)")
    ap.add_argument("--tts-model", default=None, help="FastSpeech2 checkpoint dir")
    ap.add_argument("--prompt", default="{}",
                    help='chat template; "{}" is replaced by the transcript')
    ap.add_argument("--output", default="reply.wav")
    args = ap.parse_args()

    wav, sr = load_audio(args.audio)
    llm = args.llm
    if llm is None:  # no chat LM: echo the transcript into the TTS stage
        llm = lambda text: text  # noqa: E731
    app = Appflow(app="audio_chat",
                  models=[args.asr_model, llm, args.tts_model])
    result = app(audio=wav, sampling_rate=sr, prompt=args.prompt)
    save_wav(args.output, result["result"], result.get("sampling_rate", 16000))
    print(f"transcript reply -> {args.output} "
          f"({len(np.asarray(result['result']))} samples)")


if __name__ == "__main__":
    main()
