"""DreamBooth-LoRA fine-tuning (reference ppdiffusers/examples/dreambooth):
subject images -> VAE latents -> LoRA-only SD training through the Trainer."""

import sys

import jax
import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset
from paddlemix_tpu.diffusers import DDPMScheduler
from paddlemix_tpu.diffusers.models import AutoencoderKL, UNet2DConditionModel
from paddlemix_tpu.diffusers.training_utils import make_sd_loss_fn
from paddlemix_tpu.models.clip import CLIPTextModel, CLIPTokenizer
from paddlemix_tpu.peft import LoraConfig, lora_init, lora_loss_fn, save_lora
from paddlemix_tpu.processors.image_utils import resize, to_numpy_rgb
from paddlemix_tpu.trainer import Trainer, TrainingArguments


def main():
    ckpt, image_dir, prompt = sys.argv[1], sys.argv[2], sys.argv[3]
    unet = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet")
    vae = AutoencoderKL.from_pretrained(ckpt, subfolder="vae")
    text_encoder = CLIPTextModel.from_pretrained(ckpt, subfolder="text_encoder")
    tokenizer = CLIPTokenizer.from_pretrained(ckpt, subfolder="tokenizer")
    scheduler = DDPMScheduler.from_pretrained(ckpt, subfolder="scheduler")

    import glob

    import jax.numpy as jnp
    from PIL import Image

    embeds = text_encoder(jnp.asarray(tokenizer([prompt])["input_ids"]))[0][0]
    samples = []
    for p in glob.glob(f"{image_dir}/*"):
        img = resize(to_numpy_rgb(Image.open(p)), (512, 512)).astype(np.float32)
        lat = vae.encode(jnp.asarray(img[None] / 127.5 - 1.0)).mode()[0]
        samples.append({"latents": np.asarray(lat) * vae.config.scaling_factor,
                        "encoder_hidden_states": np.asarray(embeds)})
    data = MapDataset(samples * 50)

    lcfg = LoraConfig(r=8, lora_alpha=16)
    lora = lora_init(unet.params, lcfg, jax.random.PRNGKey(0))
    loss = lora_loss_fn(make_sd_loss_fn(unet, scheduler), unet.params, lcfg)
    args = TrainingArguments(output_dir="output/dreambooth", learning_rate=1e-4,
                             max_steps=500, logging_steps=10, save_steps=0)
    trainer = Trainer(params=lora, args=args, loss_fn=loss,
                      train_dataloader=DataLoader(data, batch_size=1, shuffle=True))
    trainer.train()
    save_lora(trainer.state.params, lcfg, "output/dreambooth/lora")


if __name__ == "__main__":
    main()
