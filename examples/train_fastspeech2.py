"""FastSpeech2 TTS training: phonemes + teacher durations/pitch/energy -> mel.

TTS counterpart of examples/train_whisper_asr.py (the reference's AudioChat
synthesizes through a frozen paddlespeech fastspeech2_csmsc; here the
acoustic model trains in-framework with the composite FastSpeech2 loss —
L1 mel + MSE log-duration/pitch/energy, models/fastspeech2/).

Usage:
    python examples/train_fastspeech2.py metadata.tsv     # real corpus
    python examples/train_fastspeech2.py --synthetic      # smoke

metadata.tsv per line: "ids|durations|pitch|energy|mel.npy" where ids/
durations/pitch/energy are space-separated numbers and mel.npy is a saved
(frames, n_mels) array (standard FastSpeech2 preprocessing artifacts).
"""

import os
import sys

import numpy as np

from paddlemix_tpu.datasets import DataLoader
from paddlemix_tpu.models.fastspeech2 import (
    FastSpeech2Config,
    FastSpeech2Model,
    fastspeech2_loss,
)
from paddlemix_tpu.trainer import Trainer, TrainingArguments

SMOKE = os.environ.get("TTS_SMOKE") == "1"
CFG = (FastSpeech2Config(vocab_size=64, hidden_size=32, num_attention_heads=2,
                         encoder_layers=1, decoder_layers=1, ffn_kernel=3,
                         ffn_filters=64, num_mels=20, max_mel_len=64,
                         max_duration=6)
       if SMOKE else FastSpeech2Config())
MAX_PH = 16 if SMOKE else 96


class TTSDataset:
    def __init__(self, rows, synthetic=False):
        self.rows = rows
        self.synthetic = synthetic

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        if self.synthetic:
            rng = np.random.RandomState(i)
            n = rng.randint(4, MAX_PH)
            ids = rng.randint(1, CFG.vocab_size, n)
            dur = rng.randint(1, 4, n)
            pitch = rng.randn(n).astype(np.float32) * 0.3
            energy = rng.randn(n).astype(np.float32) * 0.3
            mel = rng.randn(CFG.max_mel_len, CFG.num_mels).astype(np.float32)
        else:
            ids_s, dur_s, p_s, e_s, mel_f = self.rows[i].split("|")
            ids = np.asarray([int(t) for t in ids_s.split()])[:MAX_PH]
            dur = np.asarray([int(t) for t in dur_s.split()])[:MAX_PH]
            pitch = np.asarray([float(t) for t in p_s.split()],
                               np.float32)[:MAX_PH]
            energy = np.asarray([float(t) for t in e_s.split()],
                                np.float32)[:MAX_PH]
            mel = np.load(mel_f).astype(np.float32)[: CFG.max_mel_len]
            mel = np.pad(mel, ((0, CFG.max_mel_len - len(mel)), (0, 0)))

        def pad(a, fill=0):
            return np.pad(np.asarray(a), (0, MAX_PH - len(a)),
                          constant_values=fill).astype(a.dtype)

        return {"phoneme_ids": pad(ids).astype(np.int32),
                "durations": pad(dur).astype(np.int32),
                "pitch": pad(pitch), "energy": pad(energy),
                "mel_target": mel}


def main():
    if "--synthetic" in sys.argv:
        data = TTSDataset(list(range(64)), synthetic=True)
        max_steps = int(os.environ.get("TTS_STEPS", 6))
    else:
        with open(sys.argv[1]) as f:
            data = TTSDataset([l.strip() for l in f if "|" in l])
        max_steps = int(os.environ.get("TTS_STEPS", 20000))

    model = FastSpeech2Model.from_config(CFG, seed=0)

    def loss_fn(params, batch, rng):
        pmask = batch["phoneme_ids"] > 0
        out = model.module.apply({"params": params}, batch["phoneme_ids"],
                                 durations=batch["durations"],
                                 pitch=batch["pitch"],
                                 energy=batch["energy"], phoneme_mask=pmask)
        loss = fastspeech2_loss(out, batch["mel_target"], batch["durations"],
                                batch["pitch"], batch["energy"], pmask, out[1])
        return loss, {}

    loader = DataLoader(data, batch_size=int(os.environ.get("TTS_BATCH", 16)),
                        shuffle=True, num_workers=2, prefetch_batches=4)
    args = TrainingArguments(output_dir="output/fastspeech2",
                             learning_rate=1e-3,
                             warmup_steps=max(max_steps // 20, 1),
                             max_steps=max_steps, logging_steps=5,
                             save_steps=2000, benchmark=True)
    Trainer(model=model, args=args, loss_fn=loss_fn,
            train_dataloader=loader).train()


if __name__ == "__main__":
    main()
