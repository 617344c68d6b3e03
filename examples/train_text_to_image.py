"""SD fine-tuning (reference ppdiffusers/examples/text_to_image): latents +
captions dataset -> Trainer with the SD denoising loss."""

import sys

import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset, stack_collate
from paddlemix_tpu.diffusers import DDPMScheduler
from paddlemix_tpu.diffusers.models import UNet2DConditionModel
from paddlemix_tpu.diffusers.training_utils import make_sd_loss_fn
from paddlemix_tpu.trainer import Trainer, TrainingArguments


def main():
    ckpt = sys.argv[1]
    unet = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet")
    scheduler = DDPMScheduler.from_pretrained(ckpt, subfolder="scheduler")
    loss_fn = make_sd_loss_fn(unet, scheduler, snr_gamma=5.0)
    # plug your latent/caption-embedding dataset here:
    rng = np.random.RandomState(0)
    data = MapDataset([{"latents": rng.randn(64, 64, 4).astype(np.float32),
                        "encoder_hidden_states": rng.randn(77, 768).astype(np.float32)}
                       for _ in range(256)])
    args = TrainingArguments(output_dir="output/sd", learning_rate=1e-5,
                             max_steps=1000, logging_steps=10, save_steps=500,
                             benchmark=True)
    Trainer(model=unet, args=args, loss_fn=loss_fn,
            train_dataloader=DataLoader(data, batch_size=8, shuffle=True)).train()


if __name__ == "__main__":
    main()
