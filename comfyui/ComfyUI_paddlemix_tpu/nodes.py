"""ComfyUI custom nodes wrapping paddlemix_tpu pipelines (parity with the
reference comfyui/ComfyUI_ppdiffusers/sd_pipe_nodes.py:30-334 and
sdxl_pipe_nodes.py): checkpoint loader, text2img / img2img / inpaint
samplers, VAE decode, prompt input, scheduler selection.

ComfyUI-host modules (folder_paths, comfy.utils) are imported lazily so this
file also imports cleanly outside ComfyUI (tests/CI)."""

from __future__ import annotations

import numpy as np

try:  # present only inside a ComfyUI process
    import folder_paths
    from comfy.utils import ProgressBar
except Exception:  # pragma: no cover
    folder_paths = None
    ProgressBar = None

CATEGORY_IN = "paddlemix_tpu/input"
CATEGORY_PIPE = "paddlemix_tpu/pipelines"
CATEGORY_OUT = "paddlemix_tpu/output"

SCHEDULERS = ["euler", "euler-ancestral", "pndm", "heun", "dpm-multi",
              "dpm-single", "unipc-multi", "ddim", "ddpm", "deis-multi",
              "lcm", "lms", "kdpm2", "kdpm2-ancestral"]


def get_scheduler(name: str):
    from paddlemix_tpu.diffusers.schedulers import (
        DDIMScheduler, DDPMScheduler, DEISMultistepScheduler,
        DPMSolverMultistepScheduler, DPMSolverSinglestepScheduler,
        EulerAncestralDiscreteScheduler, EulerDiscreteScheduler,
        HeunDiscreteScheduler, KDPM2AncestralDiscreteScheduler,
        KDPM2DiscreteScheduler, LCMScheduler, LMSDiscreteScheduler,
        PNDMScheduler, UniPCMultistepScheduler)

    table = {
        "euler": EulerDiscreteScheduler, "euler-ancestral": EulerAncestralDiscreteScheduler,
        "pndm": PNDMScheduler, "heun": HeunDiscreteScheduler,
        "dpm-multi": DPMSolverMultistepScheduler, "unipc-multi": UniPCMultistepScheduler,
        "dpm-single": DPMSolverSinglestepScheduler,
        "ddim": DDIMScheduler, "ddpm": DDPMScheduler,
        "deis-multi": DEISMultistepScheduler, "lcm": LCMScheduler,
        "lms": LMSDiscreteScheduler, "kdpm2": KDPM2DiscreteScheduler,
        "kdpm2-ancestral": KDPM2AncestralDiscreteScheduler,
    }
    kwargs = dict(beta_schedule="scaled_linear", beta_start=0.00085,
                  beta_end=0.012, timestep_spacing="leading")
    return table[name](**kwargs)


class PaddleTPUPrompt:
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"text": ("STRING", {"multiline": True, "default": ""})}}

    RETURN_TYPES = ("PROMPT",)
    FUNCTION = "get_prompt"
    CATEGORY = CATEGORY_IN

    def get_prompt(self, text):
        return (text,)


class PaddleTPUCheckpointLoader:
    @classmethod
    def INPUT_TYPES(cls):
        names = folder_paths.get_filename_list("checkpoints") if folder_paths else []
        return {"required": {"ckpt_name": (names,)}}

    RETURN_TYPES = ("PIPELINE",)
    RETURN_NAMES = ("sd_pipe",)
    FUNCTION = "load_checkpoint"
    CATEGORY = CATEGORY_IN

    def load_checkpoint(self, ckpt_name):
        from paddlemix_tpu.diffusers import StableDiffusionPipeline

        path = folder_paths.get_full_path("checkpoints", ckpt_name) \
            if folder_paths else ckpt_name
        pipe = StableDiffusionPipeline.from_pretrained(path)
        return (pipe,)


class _SamplerBase:
    RETURN_TYPES = ("LATENT",)
    RETURN_NAMES = ("latent",)
    FUNCTION = "sample"
    CATEGORY = CATEGORY_PIPE

    _COMMON = {
        "steps": ("INT", {"default": 20, "min": 1, "max": 1000}),
        "seed": ("INT", {"default": 0, "min": 0, "max": 2 ** 63 - 1}),
        "cfg": ("FLOAT", {"default": 7.5, "min": 0.0, "max": 1000.0, "step": 0.01}),
        "scheduler_type": (SCHEDULERS,),
    }


class PaddleTPUText2ImagePipe(_SamplerBase):
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "sd_pipe": ("PIPELINE",), "prompt": ("PROMPT",),
            "negative_prompt": ("PROMPT",),
            "width": ("INT", {"default": 512, "min": 64, "max": 8192}),
            "height": ("INT", {"default": 512, "min": 64, "max": 8192}),
            "number": ("INT", {"default": 1, "min": 1, "max": 100}),
            **cls._COMMON,
        }}

    def sample(self, sd_pipe, prompt, negative_prompt, width, height, number,
               steps, seed, cfg, scheduler_type):
        sd_pipe.scheduler = get_scheduler(scheduler_type)
        latent = sd_pipe(prompt=prompt, negative_prompt=negative_prompt or None,
                         width=width, height=height, num_images_per_prompt=number,
                         num_inference_steps=steps, guidance_scale=cfg,
                         seed=int(seed), output_type="latent")[0]
        return (latent,)


class PaddleTPUImage2ImagePipe(_SamplerBase):
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "sd_pipe": ("PIPELINE",), "prompt": ("PROMPT",),
            "negative_prompt": ("PROMPT",), "image": ("IMAGE",),
            "denoise": ("FLOAT", {"default": 0.75, "min": 0.0, "max": 1.0}),
            **cls._COMMON,
        }}

    def sample(self, sd_pipe, prompt, negative_prompt, image, denoise,
               steps, seed, cfg, scheduler_type):
        from paddlemix_tpu.diffusers import StableDiffusionImg2ImgPipeline

        pipe = StableDiffusionImg2ImgPipeline(
            vae=sd_pipe.vae, text_encoder=sd_pipe.text_encoder,
            tokenizer=sd_pipe.tokenizer, unet=sd_pipe.unet,
            scheduler=get_scheduler(scheduler_type))
        img = np.asarray(image, np.float32)
        latent = pipe(prompt=prompt, image=img * 2 - 1,
                      negative_prompt=negative_prompt or None,
                      strength=denoise, num_inference_steps=steps,
                      guidance_scale=cfg, seed=int(seed), output_type="latent")[0]
        return (latent,)


class PaddleTPUInpaintPipe(_SamplerBase):
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "sd_pipe": ("PIPELINE",), "prompt": ("PROMPT",),
            "negative_prompt": ("PROMPT",), "image": ("IMAGE",),
            "mask": ("MASK",),
            **cls._COMMON,
        }}

    def sample(self, sd_pipe, prompt, negative_prompt, image, mask,
               steps, seed, cfg, scheduler_type):
        from paddlemix_tpu.diffusers import StableDiffusionInpaintPipeline

        pipe = StableDiffusionInpaintPipeline(
            vae=sd_pipe.vae, text_encoder=sd_pipe.text_encoder,
            tokenizer=sd_pipe.tokenizer, unet=sd_pipe.unet,
            scheduler=get_scheduler(scheduler_type))
        img = np.asarray(image, np.float32)
        latent = pipe(prompt=prompt, image=img * 2 - 1, mask_image=np.asarray(mask),
                      negative_prompt=negative_prompt or None,
                      num_inference_steps=steps, guidance_scale=cfg,
                      seed=int(seed), output_type="latent")[0]
        return (latent,)


class PaddleTPUVaeDecoder:
    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"latent": ("LATENT",), "sd_pipe": ("PIPELINE",)}}

    RETURN_TYPES = ("IMAGE",)
    RETURN_NAMES = ("image",)
    FUNCTION = "decode"
    CATEGORY = CATEGORY_OUT

    def decode(self, sd_pipe, latent):
        import jax.numpy as jnp

        vae = sd_pipe.vae
        z = jnp.asarray(latent) / vae.config.scaling_factor
        image = vae.decode(z.astype(vae.dtype))
        image = np.asarray(jnp.clip(image.astype(jnp.float32) / 2 + 0.5, 0, 1))
        return ((image * 255).astype(np.uint8),)


NODE_CLASS_MAPPINGS = {
    "PaddleTPUPrompt": PaddleTPUPrompt,
    "PaddleTPUCheckpointLoader": PaddleTPUCheckpointLoader,
    "PaddleTPUText2ImagePipe": PaddleTPUText2ImagePipe,
    "PaddleTPUImage2ImagePipe": PaddleTPUImage2ImagePipe,
    "PaddleTPUInpaintPipe": PaddleTPUInpaintPipe,
    "PaddleTPUVaeDecoder": PaddleTPUVaeDecoder,
}

NODE_DISPLAY_NAME_MAPPINGS = {
    "PaddleTPUPrompt": "Prompt (paddlemix-tpu)",
    "PaddleTPUCheckpointLoader": "SD Checkpoint Loader (paddlemix-tpu)",
    "PaddleTPUText2ImagePipe": "SD Text2Image (paddlemix-tpu)",
    "PaddleTPUImage2ImagePipe": "SD Image2Image (paddlemix-tpu)",
    "PaddleTPUInpaintPipe": "SD Inpaint (paddlemix-tpu)",
    "PaddleTPUVaeDecoder": "VAE Decode (paddlemix-tpu)",
}
