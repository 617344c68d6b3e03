"""Audio application stack: whisper ASR -> LLM -> fastspeech2 TTS chained
through appflow (reference applications/README.md:90-91 Audio2Caption +
AudioChat), end-to-end on tiny configs."""

import numpy as np
import jax.numpy as jnp

from paddlemix_tpu.appflow.appflow import APPLICATIONS, Appflow


def _tiny_whisper():
    from paddlemix_tpu.models.whisper import (
        WhisperConfig,
        WhisperForConditionalGeneration,
    )

    cfg = WhisperConfig(vocab_size=32, num_mel_bins=80, d_model=16,
                        encoder_layers=1, decoder_layers=1,
                        encoder_attention_heads=2, decoder_attention_heads=2,
                        encoder_ffn_dim=32, decoder_ffn_dim=32,
                        max_source_positions=1500, max_target_positions=32,
                        decoder_start_token_id=1, eos_token_id=2)
    return WhisperForConditionalGeneration.from_config(cfg, seed=0)


def _tiny_fs2():
    from paddlemix_tpu.models.fastspeech2 import FastSpeech2Config, FastSpeech2Model

    cfg = FastSpeech2Config(vocab_size=32, hidden_size=16,
                            num_attention_heads=2, encoder_layers=1,
                            decoder_layers=1, ffn_kernel=3, ffn_filters=32,
                            num_mels=80, max_mel_len=64, max_duration=4)
    return FastSpeech2Model.from_config(cfg, seed=0)


def test_audio_apps_registered():
    for app in ("audio_asr", "audio2caption", "audio_chat", "text_to_speech",
                "text_generation"):
        assert app in APPLICATIONS, app


def test_audio2caption_chain():
    wav = (np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)) * 0.3).astype(np.float32)

    def fake_tokenizer(ids):
        return "ids:" + ",".join(str(int(i)) for i in ids[:3])

    def fake_llm(prompt):
        return f"caption of [{prompt}]"

    flow = Appflow(app="audio2caption",
                   models=[_tiny_whisper(), fake_llm],
                   tokenizer=fake_tokenizer)
    out = flow(audio=wav, sampling_rate=16000, max_new_tokens=4,
               prompt="describe: {}")
    assert out["asr_result"].startswith("ids:")
    assert out["result"].startswith("caption of [describe: ids:")


def test_audio_chat_chain_produces_waveform():
    wav = (np.random.RandomState(0).randn(8000) * 0.1).astype(np.float32)

    flow = Appflow(app="audio_chat",
                   models=[_tiny_whisper(), lambda p: "hello there", _tiny_fs2()],
                   tokenizer=lambda ids: "transcript")
    out = flow(audio=wav, sampling_rate=16000, max_new_tokens=4,
               griffin_lim_iters=2)
    assert out["result"].dtype == np.float32
    assert out["result"].ndim == 1 and len(out["result"]) > 256
    assert np.isfinite(out["result"]).all()
    assert out["sampling_rate"] == 16000


def test_asr_tokenizer_autoload_from_checkpoint(tmp_path):
    """A checkpoint dir with tokenizer.json gets text out without an explicit
    tokenizer kwarg (the real-checkpoint path of applications/audio2caption)."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    ckpt = tmp_path / "whisper"
    _tiny_whisper().save_pretrained(str(ckpt))
    tok = Tokenizer(WordLevel({f"t{i}": i for i in range(32)}, unk_token="t0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(str(ckpt / "tokenizer.json"))

    wav = (np.sin(np.linspace(0, 220 * 2 * np.pi, 8000)) * 0.2).astype(np.float32)
    flow = Appflow(app="audio_asr", models=[str(ckpt)])
    out = flow(audio=wav, sampling_rate=16000, max_new_tokens=3)
    assert isinstance(out["asr_result"], str) and out["asr_result"]


def test_text_generation_with_lm_tokenizer_pair():
    """The (lm, tokenizer) route drives a real causal LM's generate."""
    import jax

    from paddlemix_tpu.models.llama import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig.from_dict(dict(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64))
    lm = LlamaForCausalLM.from_config(cfg, seed=0)

    class Tok:
        def encode(self, text):
            return [3, 5, 7]

        def decode(self, ids):
            return " ".join(str(int(i)) for i in ids)

    flow = Appflow(app="text_generation", models=[(lm, Tok())])
    out = flow(prompt="hi", max_new_tokens=3)
    assert len(out["result"].split()) >= 3
