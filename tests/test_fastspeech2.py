"""FastSpeech2 TTS: length regulator semantics, train/infer forward, loss
gradients, Griffin-Lim reconstruction quality."""

import numpy as np
import jax
import jax.numpy as jnp

from paddlemix_tpu.models.fastspeech2 import (
    FastSpeech2Config,
    FastSpeech2Model,
    fastspeech2_loss,
    griffin_lim,
    length_regulate,
)

CFG = FastSpeech2Config(vocab_size=20, hidden_size=16, num_attention_heads=2,
                        encoder_layers=1, decoder_layers=1, ffn_kernel=3,
                        ffn_filters=32, num_mels=8, max_mel_len=24,
                        max_duration=6)


def test_length_regulator_matches_numpy():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 3).astype(np.float32))
    dur = jnp.asarray([[2, 0, 3, 1], [1, 1, 1, 0]])
    frames, mask = length_regulate(x, dur, max_len=8)
    # reference: naive repeat
    for b in range(2):
        expect = np.repeat(np.asarray(x[b]), np.asarray(dur[b]), axis=0)
        n = expect.shape[0]
        np.testing.assert_allclose(np.asarray(frames[b, :n]), expect, atol=1e-6)
        assert np.asarray(mask[b]).sum() == n
        np.testing.assert_allclose(np.asarray(frames[b, n:]), 0.0)


def test_fastspeech2_infer_and_train():
    model = FastSpeech2Model.from_config(CFG, seed=0)
    ids = jnp.asarray([[3, 5, 7, 0]], jnp.int32)
    mel, mask = model.synthesize(ids)
    assert mel.shape == (1, CFG.max_mel_len, CFG.num_mels)
    assert bool(jnp.all(jnp.isfinite(mel)))
    # padded phonemes contribute no frames beyond the mask
    assert int(mask.sum()) <= 3 * CFG.max_duration

    # teacher-forced training step: loss is finite, grads reach everything
    dur = jnp.asarray([[2, 3, 2, 0]])
    pitch = jnp.asarray([[0.1, -0.2, 0.3, 0.0]])
    energy = jnp.asarray([[0.5, 0.1, -0.1, 0.0]])
    mel_t = jnp.zeros((1, CFG.max_mel_len, CFG.num_mels))
    pmask = ids > 0

    def loss_fn(p):
        out = model.module.apply({"params": p}, ids, durations=dur,
                                 pitch=pitch, energy=energy)
        return fastspeech2_loss(out, mel_t, dur, pitch, energy, pmask, out[1])

    loss, grads = jax.value_and_grad(loss_fn)(model.params)
    assert np.isfinite(float(loss))
    gsum = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gsum > 0
    # the duration predictor itself receives gradient
    assert float(jnp.abs(jax.tree_util.tree_leaves(
        grads["duration_predictor"])[0]).sum()) > 0


def test_fastspeech2_roundtrip(tmp_path):
    model = FastSpeech2Model.from_config(CFG, seed=0)
    model.save_pretrained(str(tmp_path))
    re = FastSpeech2Model.from_pretrained(str(tmp_path))
    ids = jnp.asarray([[3, 5, 7, 2]], jnp.int32)
    a, _ = model.synthesize(ids)
    b, _ = re.synthesize(ids)
    assert float(jnp.abs(a - b).max()) == 0.0


def test_griffin_lim_reconstructs_tone():
    """A pure tone's mel -> Griffin-Lim -> spectrum peaks at the right bin."""
    from paddlemix_tpu.processors.whisper_processing import slaney_mel_filterbank

    sr, n_fft, hop = 16000, 1024, 256
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 440.0 * t).astype(np.float64)
    win = np.hanning(n_fft + 1)[:-1]
    T = (len(tone) - n_fft) // hop + 1
    idx = np.arange(n_fft)[:, None] + hop * np.arange(T)[None, :]
    spec = np.abs(np.fft.rfft(tone[idx] * win[:, None], n=n_fft, axis=0))
    fb = slaney_mel_filterbank(n_fft // 2 + 1, 80, sr)
    mel = np.log(np.maximum(spec.T @ fb, 1e-10))       # (T, 80)
    wav = griffin_lim(mel, fb, n_fft=n_fft, hop=hop, n_iter=8)
    assert np.isfinite(wav).all() and len(wav) > sr // 2
    # dominant frequency of the reconstruction ~ 440 Hz
    sp = np.abs(np.fft.rfft(wav))
    peak_hz = np.argmax(sp) * sr / len(wav)
    assert abs(peak_hz - 440.0) < 30.0, peak_hz
