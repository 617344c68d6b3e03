"""EVA-02 masked-image-modeling pretraining through the FULL data plane
(reference paddlemix/examples/eva02 pretrain: eva02_transforms
DataAugmentationForEVA -> trainer; processors/eva02_processing.py here).

jpeg files on disk -> PIL decode -> two-resolution random crop (student +
teacher views) -> block-wise MIM mask -> worker-pool DataLoader -> device
prefetch -> jitted MIM step (student regresses frozen-teacher features on
masked patches, cosine loss). The trainer's `ips:` lines report reader share
(the <5% north star).

Usage:
    python examples/train_eva02_mim.py /path/to/images
    python examples/train_eva02_mim.py --synthetic   # smoke over random jpegs
"""

import glob
import os
import sys

import numpy as np

from paddlemix_tpu.datasets import DataLoader
from paddlemix_tpu.models.clip.configuration import CLIPVisionConfig
from paddlemix_tpu.models.clip.modeling import CLIPVisionTransformer
from paddlemix_tpu.models.eva02 import EVA02Config, EVA02Model
from paddlemix_tpu.models.eva02.modeling import mim_loss
from paddlemix_tpu.processors.eva02_processing import DataAugmentationForEVA
from paddlemix_tpu.trainer import Trainer, TrainingArguments

TINY = os.environ.get("EVA02_TINY") == "1"

STUDENT = EVA02Config(**(dict(image_size=56, patch_size=14, hidden_size=32,
                              intermediate_size=64, num_hidden_layers=2,
                              num_attention_heads=2, teacher_dim=32) if TINY
                         else dict(image_size=224, patch_size=14,
                                   hidden_size=768, intermediate_size=2048,
                                   num_hidden_layers=12,
                                   num_attention_heads=12, teacher_dim=768)))
TEACHER = CLIPVisionConfig(**(dict(hidden_size=32, intermediate_size=64,
                                   num_hidden_layers=2, num_attention_heads=2,
                                   image_size=56, patch_size=14) if TINY
                              else dict(hidden_size=768,
                                        intermediate_size=3072,
                                        num_hidden_layers=12,
                                        num_attention_heads=12,
                                        image_size=224, patch_size=14)))


class MIMDataset:
    """jpeg path -> DataAugmentationForEVA views; augmentation runs in the
    DataLoader worker pool so it overlaps device compute."""

    def __init__(self, paths, aug):
        self.paths = paths
        self.aug = aug

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from PIL import Image

        with Image.open(self.paths[i]) as im:
            out = self.aug(im.convert("RGB"))
        return {k: np.asarray(v) for k, v in out.items()}


def _synthetic_paths(root, n=256):
    from PIL import Image

    rng = np.random.RandomState(0)
    os.makedirs(root, exist_ok=True)
    base = rng.randint(0, 255, (320, 400, 3), np.uint8)
    paths = []
    for i in range(n):
        p = os.path.join(root, f"syn_{i:04d}.jpg")
        if not os.path.exists(p):
            Image.fromarray(np.roll(base, i * 13, axis=0)).save(p, quality=88)
        paths.append(p)
    return paths


def main():
    import jax
    import jax.numpy as jnp

    if "--synthetic" in sys.argv:
        paths = _synthetic_paths("/tmp/eva02_synth_jpegs",
                                 n=64 if TINY else 256)
        max_steps = int(os.environ.get("EVA02_STEPS", 8 if TINY else 20))
    else:
        paths = sorted(sum((glob.glob(os.path.join(sys.argv[1], pat))
                            for pat in ("*.jpg", "*.jpeg", "*.png")), []))
        max_steps = int(os.environ.get("EVA02_STEPS", 10000))

    size = STUDENT.image_size
    grid = size // STUDENT.patch_size
    aug = DataAugmentationForEVA(
        input_size=size, second_input_size=TEACHER.image_size,
        patch_size=STUDENT.patch_size,
        num_mask_patches=max(int(grid * grid * 0.4), 1), seed=0)

    student = EVA02Model.from_config(STUDENT, seed=0, dtype=jnp.bfloat16)
    teacher = CLIPVisionTransformer(TEACHER, dtype=jnp.bfloat16)
    t_px = jnp.zeros((1, TEACHER.image_size, TEACHER.image_size, 3),
                     jnp.bfloat16)
    teacher_params = teacher.init(jax.random.PRNGKey(1), t_px)["params"]

    def loss_fn(params, batch, rng):
        mask = batch["bool_masked_pos"]
        pred = student.module.apply(
            {"params": params}, batch["pixel_values"].astype(jnp.bfloat16),
            bool_masked_pos=mask)
        # frozen teacher: patch features of the SAME crop (stop-gradient)
        feats, _ = teacher.apply(
            {"params": teacher_params},
            batch["teacher_pixel_values"].astype(jnp.bfloat16))
        target = jax.lax.stop_gradient(feats[:, 1:])  # drop CLS
        return mim_loss(pred.astype(jnp.float32),
                        target.astype(jnp.float32), mask), {}

    loader = DataLoader(MIMDataset(paths, aug),
                        batch_size=int(os.environ.get("EVA02_BATCH",
                                                      8 if TINY else 64)),
                        shuffle=True, num_workers=2 if TINY else 8,
                        prefetch_batches=4)
    args = TrainingArguments(output_dir="output/eva02_mim",
                             learning_rate=1.5e-3,
                             warmup_steps=max(max_steps // 10, 1),
                             max_steps=max_steps,
                             logging_steps=1 if TINY else 5,
                             save_steps=10_000, benchmark=True)
    Trainer(model=student, args=args, loss_fn=loss_fn,
            train_dataloader=loader).train()


if __name__ == "__main__":
    main()
