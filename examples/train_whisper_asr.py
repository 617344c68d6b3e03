"""Whisper ASR fine-tuning through the full data plane.

Speech counterpart of examples/train_clip.py (the reference ships no ASR
trainer at all — its audio apps call frozen paddlespeech executors; this
framework's whisper is first-class, models/whisper/): wav files -> host
log-mel (WhisperProcessor, inside the DataLoader worker pool so feature
extraction overlaps device compute) -> padded transcript ids -> teacher-forced
encoder-decoder cross-entropy sharded by the Trainer.

Usage:
    python examples/train_whisper_asr.py /path/to/wavs transcripts.tsv
    python examples/train_whisper_asr.py --synthetic     # smoke, sine "speech"

transcripts.tsv: one "filename<TAB>token ids (space-separated)" per line —
pre-tokenized transcripts, any tokenizer (whisper BPE offline here).
"""

import os
import sys

import numpy as np

from paddlemix_tpu.datasets import DataLoader
from paddlemix_tpu.models.whisper import WhisperConfig, WhisperForConditionalGeneration
from paddlemix_tpu.processors.whisper_processing import WhisperProcessor
from paddlemix_tpu.trainer import Trainer, TrainingArguments

SMOKE = os.environ.get("ASR_SMOKE") == "1"
# whisper-tiny geometry (384d, 4+4 layers); ASR_SMOKE=1 shrinks the model and
# clips audio to 4 s so the CPU-mesh smoke finishes in seconds
TINY_EN = (WhisperConfig(d_model=64, encoder_layers=1, decoder_layers=1,
                         encoder_attention_heads=2, decoder_attention_heads=2,
                         encoder_ffn_dim=128, decoder_ffn_dim=128,
                         max_source_positions=200, vocab_size=256,
                         decoder_start_token_id=1, eos_token_id=2)
           if SMOKE else WhisperConfig())
CHUNK_S = 4.0 if SMOKE else 30.0
MAX_TARGET = 48


class SpeechDataset:
    def __init__(self, items, processor, synthetic=False):
        self.items = items          # [(path_or_seed, id list)]
        self.processor = processor
        self.synthetic = synthetic

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        src, ids = self.items[i]
        if self.synthetic:
            rng = np.random.RandomState(src)
            t = np.arange(16000 * 2) / 16000.0
            wav = (0.2 * np.sin(2 * np.pi * (200 + 40 * src) * t)
                   + 0.02 * rng.randn(len(t))).astype(np.float32)
        else:
            import wave

            with wave.open(src) as w:
                raw = w.readframes(w.getnframes())
                wav = (np.frombuffer(raw, np.int16).astype(np.float32)
                       / 32768.0)
        feats = self.processor(wav)                      # (T, 80)
        dec = np.full(MAX_TARGET, -100, np.int32)        # -100 = ignore
        ids = [TINY_EN.decoder_start_token_id] + list(ids)[: MAX_TARGET - 2] \
            + [TINY_EN.eos_token_id]
        dec[: len(ids)] = ids
        return {"input_features": feats.astype(np.float32),
                "decoder_ids": dec}


def main():
    if "--synthetic" in sys.argv:
        items = [(i, [5 + i % 40, 80 + i % 20, 7]) for i in range(64)]
        synthetic = True
        max_steps = int(os.environ.get("ASR_STEPS", 8))
    else:
        wav_root, tsv = sys.argv[1], sys.argv[2]
        with open(tsv) as f:
            items = [(os.path.join(wav_root, a),
                      [int(t) for t in b.split()]) for a, b in
                     (line.split("\t", 1) for line in f if "\t" in line)]
        synthetic = False
        max_steps = int(os.environ.get("ASR_STEPS", 5000))

    import jax.numpy as jnp
    import optax

    model = WhisperForConditionalGeneration.from_config(TINY_EN, seed=0)

    def loss_fn(params, batch, rng):
        dec = batch["decoder_ids"]
        inp = jnp.maximum(dec[:, :-1], 0)
        tgt = dec[:, 1:]
        logits = model.module.apply({"params": params},
                                    batch["input_features"], inp)
        mask = (tgt != -100).astype(jnp.float32)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.maximum(tgt, 0))
        return jnp.sum(ce * mask) / jnp.maximum(mask.sum(), 1.0), {}

    data = SpeechDataset(items, WhisperProcessor(chunk_length_s=CHUNK_S),
                          synthetic=synthetic)
    loader = DataLoader(data, batch_size=int(os.environ.get("ASR_BATCH", 8)),
                        shuffle=True, num_workers=4, prefetch_batches=4)
    args = TrainingArguments(output_dir="output/whisper_asr",
                             learning_rate=1e-4,
                             warmup_steps=max(max_steps // 10, 1),
                             max_steps=max_steps, logging_steps=5,
                             save_steps=1000, benchmark=True)
    Trainer(model=model, args=args, loss_fn=loss_fn,
            train_dataloader=loader).train()


if __name__ == "__main__":
    main()
