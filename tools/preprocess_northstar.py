"""Measure the preprocessing north star on the real chip: reader share <5%
of step time with REAL jpeg decode + resize + normalize in the input path.

Runs the full data plane as one pipeline — jpeg files on disk -> PIL decode
-> CLIPImageProcessor (resize shortest edge/bicubic + center crop +
normalize) -> worker-pool DataLoader -> device put-ahead prefetch ->
contrastive CLIP train step — and reports the Trainer's own reader-share
telemetry (trainer.py 'ips:' lines; reference counterpart:
paddlemix/trainer/blip2_trainer.py:125-155 BenchmarkCallback reader-cost).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/preprocess_northstar.py
Knobs: NS_STEPS (default 24), NS_BATCH (64), NS_WORKERS (8), NS_IMAGES (512),
PMIX_NATIVE_PREPROCESS=1 to A/B the fused C++ resize+normalize path.

Writes one JSON line: {"reader_pct", "ips", "batch", "workers", "native"}.
"""

import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(root, n, hw=(480, 640)):
    """n real jpegs with enough structure that decode cost is realistic."""
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    base = rng.randint(0, 255, (*hw, 3), np.uint8)
    for i in range(n):
        # shift + noise per image: distinct files, ~natural jpeg sizes
        arr = np.roll(base, i * 7, axis=1)
        arr = np.clip(arr.astype(np.int16)
                      + rng.randint(-20, 20, arr.shape, np.int16),
                      0, 255).astype(np.uint8)
        p = os.path.join(root, f"img_{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=88)
        paths.append(p)
    return paths


def main():
    steps = int(os.environ.get("NS_STEPS", 24))
    batch = int(os.environ.get("NS_BATCH", 64))
    workers = int(os.environ.get("NS_WORKERS", 8))
    n_images = int(os.environ.get("NS_IMAGES", 512))
    native = os.environ.get("PMIX_NATIVE_PREPROCESS", "") == "1"

    import jax
    import jax.numpy as jnp

    from paddlemix_tpu.datasets.collator import DataLoader
    from paddlemix_tpu.models.clip import (
        CLIPConfig,
        CLIPModel,
        clip_contrastive_loss,
    )
    from paddlemix_tpu.processors.clip_processing import CLIPImageProcessor
    from paddlemix_tpu.trainer import Trainer, TrainingArguments

    tmp = tempfile.mkdtemp(prefix="ns_jpegs_")
    t0 = time.time()
    paths = make_jpegs(tmp, n_images)
    print(f"# wrote {n_images} jpegs in {time.time()-t0:.1f}s", file=sys.stderr)

    proc = CLIPImageProcessor()
    rng = np.random.RandomState(1)
    captions = rng.randint(1, 49000, (n_images, 77)).astype(np.int32)

    class JpegClipDataset:
        def __len__(self):
            return n_images

        def __getitem__(self, i):
            from PIL import Image

            with Image.open(paths[i]) as im:  # REAL jpeg decode
                px = proc(im.convert("RGB"))["pixel_values"][0]
            return {"pixel_values": px.astype(np.float32),
                    "input_ids": captions[i]}

    cfg = CLIPConfig(
        vision_config=dict(hidden_size=768, intermediate_size=3072,
                           num_hidden_layers=12, num_attention_heads=12,
                           image_size=224, patch_size=16),
        text_config=dict(hidden_size=512, intermediate_size=2048,
                         num_hidden_layers=12, num_attention_heads=8,
                         max_position_embeddings=77),
        projection_dim=512,
    )
    model = CLIPModel.from_config(cfg, seed=0, dtype=jnp.bfloat16)

    def loss_fn(params, batch, rng):
        img, txt, scale = model.module.apply(
            {"params": params}, batch["pixel_values"].astype(jnp.bfloat16),
            batch["input_ids"])
        return clip_contrastive_loss(img, txt, scale), {}

    loader = DataLoader(JpegClipDataset(), batch_size=batch, shuffle=True,
                        num_workers=workers, prefetch_batches=workers)
    args = TrainingArguments(output_dir=os.path.join(tmp, "out"),
                             max_steps=steps, logging_steps=4, save_steps=0,
                             warmup_steps=2, learning_rate=1e-4)
    tr = Trainer(model=model, args=args, loss_fn=loss_fn,
                 train_dataloader=loader)
    seen = []
    tr.callbacks.append(lambda step, metrics: seen.append(dict(metrics)))
    tr.train()

    tail = [m for m in seen if "reader_cost" in m][1:]  # drop warmup window
    reader_cost = float(np.mean([m["reader_cost"] for m in tail]))
    ips = float(np.mean([m["ips"] for m in tail]))
    reader_pct = reader_cost * ips / batch * 100
    print(json.dumps({
        "metric": "preprocessing_share_of_step",
        "reader_pct": round(reader_pct, 2),
        "ips": round(ips, 1),
        "step_ms": round(batch / ips * 1e3, 1),
        "batch": batch, "workers": workers, "native": native,
        "target": "<5%", "ok": reader_pct < 5.0,
    }))


if __name__ == "__main__":
    main()
