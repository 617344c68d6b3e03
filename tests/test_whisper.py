"""Whisper ASR: parity vs transformers' torch implementation (weights
converted through the HF checkpoint layout), greedy generate, processor
fidelity vs WhisperFeatureExtractor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from paddlemix_tpu.core.modeling import unflatten_params
from paddlemix_tpu.models.whisper import (
    WhisperConfig,
    WhisperForConditionalGeneration,
    sinusoids,
)

TINY = dict(vocab_size=64, num_mel_bins=8, d_model=16, encoder_layers=2,
            decoder_layers=2, encoder_attention_heads=2,
            decoder_attention_heads=2, encoder_ffn_dim=32, decoder_ffn_dim=32,
            max_source_positions=6, max_target_positions=10)


def _hf_pair():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration as HFWhisper

    torch.manual_seed(0)
    hf = HFWhisper(HFConfig(**TINY, pad_token_id=0, bos_token_id=1,
                            eos_token_id=2, decoder_start_token_id=3)).eval()
    flat = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    cfg = WhisperConfig(**TINY, eos_token_id=2, decoder_start_token_id=3)
    fm = WhisperForConditionalGeneration(cfg)
    fm.params = unflatten_params(
        WhisperForConditionalGeneration.convert_foreign_state_dict(flat, cfg))
    return hf, fm, cfg


def test_whisper_matches_transformers():
    hf, fm, cfg = _hf_pair()
    rs = np.random.RandomState(0)
    feats = rs.randn(2, cfg.num_mel_bins, 12).astype(np.float32)  # HF: (B,M,T)
    dec_ids = rs.randint(0, cfg.vocab_size, (2, 5))
    with torch.no_grad():
        ref = hf(input_features=torch.from_numpy(feats),
                 decoder_input_ids=torch.from_numpy(dec_ids)).logits
    got = fm.module.apply({"params": fm.params},
                          jnp.asarray(np.transpose(feats, (0, 2, 1))),
                          jnp.asarray(dec_ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_whisper_sinusoids_match_hf_table():
    hf, fm, cfg = _hf_pair()
    table = hf.model.encoder.embed_positions.weight.detach().numpy()
    np.testing.assert_allclose(sinusoids(cfg.max_source_positions, cfg.d_model),
                               table, atol=1e-6)


def test_whisper_generate_matches_full_forward():
    """Greedy cached decode == argmax over the uncached full forward."""
    _, fm, cfg = _hf_pair()
    rs = np.random.RandomState(1)
    feats = jnp.asarray(rs.randn(1, 12, cfg.num_mel_bins).astype(np.float32))
    toks = np.asarray(fm.generate(feats, max_new_tokens=4, eos_token_id=-1))
    assert toks.shape == (1, 4)
    # re-derive step-by-step with the plain forward
    cur = [cfg.decoder_start_token_id]
    for t in range(4):
        logits = fm.module.apply({"params": fm.params}, feats,
                                 jnp.asarray([cur], jnp.int32))
        nxt = int(jnp.argmax(logits[0, -1]))
        assert nxt == int(toks[0, t]), f"step {t}"
        cur.append(nxt)


def test_whisper_forced_decoder_ids():
    _, fm, cfg = _hf_pair()
    feats = jnp.zeros((1, 12, cfg.num_mel_bins))
    toks = np.asarray(fm.generate(feats, max_new_tokens=3,
                                  forced_decoder_ids=(7, 9), eos_token_id=-1))
    assert toks[0, 0] == 7 and toks[0, 1] == 9
    assert toks.shape == (1, 5)


def test_whisper_processor_matches_transformers():
    from transformers import WhisperFeatureExtractor

    from paddlemix_tpu.processors.whisper_processing import WhisperProcessor

    sr = 16000
    rs = np.random.RandomState(0)
    wav = (rs.randn(sr * 2) * 0.1).astype(np.float32)  # 2 s of noise
    ref = WhisperFeatureExtractor(feature_size=80)(
        [wav], sampling_rate=sr, return_tensors="np")["input_features"][0]
    got = WhisperProcessor()(wav, sampling_rate=sr)  # (T, 80) NWC
    np.testing.assert_allclose(got.T, ref, atol=2e-4, rtol=1e-4)


def test_whisper_save_load_roundtrip(tmp_path):
    _, fm, cfg = _hf_pair()
    fm.save_pretrained(str(tmp_path))
    re = WhisperForConditionalGeneration.from_pretrained(str(tmp_path))
    feats = jnp.zeros((1, 8, cfg.num_mel_bins))
    ids = jnp.zeros((1, 2), jnp.int32)
    a = fm.module.apply({"params": fm.params}, feats, ids)
    b = re.module.apply({"params": re.params}, feats, ids)
    assert float(jnp.abs(a - b).max()) == 0.0
