"""DreamBooth full-model fine-tuning with prior preservation
(reference ppdiffusers/examples/dreambooth/train_dreambooth.py): instance
images of the subject + generated class images; the class batch's loss is
weighted by --prior-loss-weight to preserve the class prior while the whole
UNet trains on the instance prompt.

Usage:
  python examples/train_dreambooth.py CKPT INSTANCE_DIR "a sks dog" \
      [CLASS_DIR "a dog" [PRIOR_LOSS_WEIGHT]]

Without CLASS_DIR it degrades to plain subject fine-tuning. The reference
auto-generates class images with the frozen pipeline when CLASS_DIR is
short; offline we require them on disk (generate with
``applications/text2image.py`` beforehand).
"""

import glob
import sys

import jax
import jax.numpy as jnp
import numpy as np

from paddlemix_tpu.datasets import DataLoader, MapDataset
from paddlemix_tpu.diffusers import DDPMScheduler
from paddlemix_tpu.diffusers.models import AutoencoderKL, UNet2DConditionModel
from paddlemix_tpu.models.clip import CLIPTextModel, CLIPTokenizer
from paddlemix_tpu.processors.image_utils import resize, to_numpy_rgb
from paddlemix_tpu.trainer import Trainer, TrainingArguments


def encode_dir(image_dir, prompt, vae, text_encoder, tokenizer, is_prior):
    from PIL import Image

    embeds = text_encoder(jnp.asarray(tokenizer([prompt])["input_ids"]))[0][0]
    samples = []
    for p in sorted(glob.glob(f"{image_dir}/*")):
        img = resize(to_numpy_rgb(Image.open(p)), (512, 512)).astype(np.float32)
        lat = vae.encode(jnp.asarray(img[None] / 127.5 - 1.0)).mode()[0]
        samples.append({
            "latents": np.asarray(lat) * vae.config.scaling_factor,
            "encoder_hidden_states": np.asarray(embeds),
            "is_prior": np.float32(is_prior),
        })
    if not samples:
        raise FileNotFoundError(f"no images under {image_dir}")
    return samples


def make_dreambooth_loss_fn(unet, scheduler, prior_loss_weight: float):
    """Per-example epsilon MSE, class examples scaled by the prior weight
    (reference train_dreambooth.py: loss + args.prior_loss_weight *
    prior_loss, computed here as one weighted batch instead of a chunked
    double forward)."""
    num_train = scheduler.config.num_train_timesteps

    def loss_fn(params, batch, rng):
        latents = batch["latents"].astype(jnp.float32)
        b = latents.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, num_train)
        noise = jax.random.normal(rng_n, latents.shape, jnp.float32)
        noisy = scheduler.add_noise(latents, noise, t)
        pred = unet.module.apply(
            {"params": params}, noisy.astype(unet.dtype), t,
            batch["encoder_hidden_states"].astype(unet.dtype)).astype(jnp.float32)
        per_ex = jnp.mean((pred - noise) ** 2, axis=(1, 2, 3))
        w = jnp.where(batch["is_prior"] > 0, prior_loss_weight, 1.0)
        return jnp.mean(per_ex * w)

    return loss_fn


def main():
    ckpt, instance_dir, instance_prompt = sys.argv[1], sys.argv[2], sys.argv[3]
    class_dir = sys.argv[4] if len(sys.argv) > 4 else None
    class_prompt = sys.argv[5] if len(sys.argv) > 5 else None
    prior_w = float(sys.argv[6]) if len(sys.argv) > 6 else 1.0

    unet = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet")
    vae = AutoencoderKL.from_pretrained(ckpt, subfolder="vae")
    text_encoder = CLIPTextModel.from_pretrained(ckpt, subfolder="text_encoder")
    tokenizer = CLIPTokenizer.from_pretrained(ckpt, subfolder="tokenizer")
    scheduler = DDPMScheduler.from_pretrained(ckpt, subfolder="scheduler")

    samples = encode_dir(instance_dir, instance_prompt, vae, text_encoder,
                         tokenizer, is_prior=0.0)
    if class_dir:
        samples += encode_dir(class_dir, class_prompt or instance_prompt,
                              vae, text_encoder, tokenizer, is_prior=1.0)
    data = MapDataset(samples * 50)

    loss = make_dreambooth_loss_fn(unet, scheduler, prior_w)
    args = TrainingArguments(output_dir="output/dreambooth_full",
                             learning_rate=5e-6, max_steps=800,
                             logging_steps=10, save_steps=0)
    trainer = Trainer(params=unet.params, args=args, loss_fn=loss,
                      train_dataloader=DataLoader(data, batch_size=2,
                                                  shuffle=True))
    trainer.train()
    unet.params = trainer.state.params
    unet.save_pretrained("output/dreambooth_full/unet")


if __name__ == "__main__":
    main()
