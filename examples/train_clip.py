"""CLIP contrastive pretraining through the FULL data plane (reference
paddlemix/examples/clip train: coco clip recipe -> CLIPTrainer).

Unlike the latent-space examples, this one exercises the whole input
pipeline as a user would run it: jpeg files on disk -> PIL decode ->
CLIPImageProcessor (resize/bicubic + center crop + normalize, optionally the
fused C++ path via PMIX_NATIVE_PREPROCESS=1) -> tokenizer -> worker-pool
DataLoader -> device put-ahead prefetch -> sharded contrastive step. The
trainer's `ips:` lines report reader share; the <5% north star is measured
by tools/preprocess_northstar.py on the same path.

Usage:
    python examples/train_clip.py /path/to/images captions.tsv [vocab.json]
    python examples/train_clip.py --synthetic     # smoke run, generated jpegs

captions.tsv: one "filename<TAB>caption" per line.
"""

import os
import sys

import numpy as np

from paddlemix_tpu.datasets import DataLoader
from paddlemix_tpu.models.clip import CLIPConfig, CLIPModel, clip_contrastive_loss
from paddlemix_tpu.processors.clip_processing import CLIPImageProcessor
from paddlemix_tpu.trainer import Trainer, TrainingArguments

VITB16 = CLIPConfig(
    vision_config=dict(hidden_size=768, intermediate_size=3072,
                       num_hidden_layers=12, num_attention_heads=12,
                       image_size=224, patch_size=16),
    text_config=dict(hidden_size=512, intermediate_size=2048,
                     num_hidden_layers=12, num_attention_heads=8,
                     max_position_embeddings=77),
    projection_dim=512,
)


class ImageTextDataset:
    """jpeg path + caption ids; decode + preprocess happen HERE, inside the
    DataLoader worker pool, so host work overlaps device compute."""

    def __init__(self, items, processor, tokenize):
        self.items = items          # [(path, caption str)]
        self.processor = processor
        self.tokenize = tokenize

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        from PIL import Image

        path, caption = self.items[i]
        with Image.open(path) as im:
            px = self.processor(im.convert("RGB"))["pixel_values"][0]
        return {"pixel_values": px.astype(np.float32),
                "input_ids": self.tokenize(caption)}


def _hash_tokenize(caption, max_len=77, vocab=49408):
    """Stand-in tokenizer for runs without a vocab file (synthetic smoke);
    real runs pass vocab.json and get the BPE CLIPTokenizer."""
    ids = np.zeros(max_len, np.int32)
    words = caption.split()[: max_len - 2]
    ids[0] = vocab - 2
    for j, w in enumerate(words):
        ids[j + 1] = (hash(w) % (vocab - 3)) + 1
    ids[len(words) + 1] = vocab - 1
    return ids


def _synthetic_items(root, n=256):
    from PIL import Image

    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    items = []
    base = rng.randint(0, 255, (480, 640, 3), np.uint8)
    for i in range(n):
        p = os.path.join(root, f"syn_{i:04d}.jpg")
        if not os.path.exists(p):
            Image.fromarray(np.roll(base, i * 11, axis=1)).save(p, quality=88)
        items.append((p, f"synthetic image number {i} of rolled noise"))
    return items


def main():
    if "--synthetic" in sys.argv:
        items = _synthetic_items("/tmp/clip_synth_jpegs")
        tokenize = _hash_tokenize
        max_steps = int(os.environ.get("CLIP_STEPS", 20))
    else:
        image_root, captions_tsv = sys.argv[1], sys.argv[2]
        with open(captions_tsv) as f:
            items = [(os.path.join(image_root, a), b.strip()) for a, b in
                     (line.split("\t", 1) for line in f if "\t" in line)]
        if len(sys.argv) > 3:
            from paddlemix_tpu.utils.tokenizer import load_tokenizer

            tok = load_tokenizer(sys.argv[3])

            def tokenize(c):
                ids = np.asarray(tok.encode(c)[:77], np.int32)
                return np.pad(ids, (0, 77 - len(ids)))
        else:
            tokenize = _hash_tokenize
        max_steps = int(os.environ.get("CLIP_STEPS", 10000))

    import jax.numpy as jnp

    model = CLIPModel.from_config(VITB16, seed=0, dtype=jnp.bfloat16)

    def loss_fn(params, batch, rng):
        img, txt, scale = model.module.apply(
            {"params": params}, batch["pixel_values"].astype(jnp.bfloat16),
            batch["input_ids"])
        return clip_contrastive_loss(img, txt, scale), {}

    data = ImageTextDataset(items, CLIPImageProcessor(), tokenize)
    loader = DataLoader(data, batch_size=int(os.environ.get("CLIP_BATCH", 64)),
                        shuffle=True, num_workers=8, prefetch_batches=8)
    args = TrainingArguments(output_dir="output/clip", learning_rate=5e-4,
                             warmup_steps=min(200, max(max_steps // 10, 1)),
                             max_steps=max_steps,
                             logging_steps=10, save_steps=1000, benchmark=True)
    Trainer(model=model, args=args, loss_fn=loss_fn,
            train_dataloader=loader).train()


if __name__ == "__main__":
    main()
