"""The training-example loss functions produce finite losses and gradients on
tiny models (mirrors how the reference examples are smoke-tested)."""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def _load(name):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", name)
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _grad_total(loss_fn, params, batch):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch,
                                              jax.random.PRNGKey(0))
    total = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    return float(loss), total


def test_dit_training_loss():
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import DiTConfig, DiTModel

    mod = _load("train_dit.py")
    model = DiTModel.from_config(DiTConfig(
        sample_size=8, patch_size=2, hidden_size=32, num_layers=2,
        num_attention_heads=2, num_classes=10))
    loss_fn = mod.make_dit_loss_fn(model, DDPMScheduler(num_train_timesteps=100))
    batch = {"latents": jnp.ones((2, 8, 8, 4)),
             "labels": jnp.asarray([1, 2], jnp.int32)}
    loss, total = _grad_total(loss_fn, model.params, batch)
    assert np.isfinite(loss) and total > 0


def test_lcm_distill_loss():
    from paddlemix_tpu.diffusers import DDIMScheduler
    from paddlemix_tpu.diffusers.models import (
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    mod = _load("train_lcm_distill.py")
    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(
        dict(sample_size=8, block_out_channels=(16, 32),
             down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
             up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
             layers_per_block=1, cross_attention_dim=24,
             attention_head_dim=2, norm_num_groups=8)))
    teacher = jax.tree_util.tree_map(jnp.copy, unet.params)
    loss_fn = mod.make_lcm_loss_fn(unet, teacher,
                                   DDIMScheduler(num_train_timesteps=100),
                                   num_ddim_steps=10)
    batch = {"latents": jnp.ones((2, 8, 8, 4)),
             "encoder_hidden_states": jnp.ones((2, 4, 24))}
    loss, total = _grad_total(loss_fn, unet.params, batch)
    assert np.isfinite(loss) and total > 0


def test_controlnet_training_loss():
    from paddlemix_tpu.diffusers import DDPMScheduler
    from paddlemix_tpu.diffusers.models import (
        ControlNetConfig,
        ControlNetModel,
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    mod = _load("train_controlnet.py")
    unet_cfg = dict(sample_size=8, block_out_channels=(16, 32),
                    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
                    layers_per_block=1, cross_attention_dim=24,
                    attention_head_dim=2, norm_num_groups=8)
    unet = UNet2DConditionModel.from_config(
        UNet2DConditionConfig.from_dict(unet_cfg))
    cn = ControlNetModel.from_config(ControlNetConfig.from_dict(
        dict(unet_cfg, conditioning_channels=3)))
    loss_fn = mod.make_controlnet_loss_fn(unet, cn,
                                          DDPMScheduler(num_train_timesteps=100))
    batch = {"latents": jnp.ones((1, 8, 8, 4)),
             "encoder_hidden_states": jnp.ones((1, 4, 24)),
             "conditioning": jnp.ones((1, 64, 64, 3))}
    loss, total = _grad_total(loss_fn, cn.params, batch)
    assert np.isfinite(loss) and total > 0


def test_textual_inversion_example(tmp_path):
    """examples/train_textual_inversion.py trains a vector and the saved
    learned_embeds file loads through load_textual_inversion."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "learned.safetensors")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_textual_inversion.py",
         "--steps", "3", "--resolution", "32", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout and os.path.exists(out)

    from paddlemix_tpu.diffusers import DDPMScheduler, StableDiffusionPipeline
    from paddlemix_tpu.diffusers.loaders import load_textual_inversion
    from tests.test_pipelines import (
        tiny_text_encoder,
        tiny_tokenizer,
        tiny_unet,
        tiny_vae,
    )

    tok = tiny_tokenizer()
    pipe = StableDiffusionPipeline(
        vae=tiny_vae(), text_encoder=tiny_text_encoder(tok), tokenizer=tok,
        unet=tiny_unet(), scheduler=DDPMScheduler())
    load_textual_inversion(pipe, out, token="<concept>")


def test_ip_adapter_training_example():
    """Only to_k_ip/to_v_ip (+ the projection head) receive updates."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_ip_adapter.py",
         "--steps", "3", "--resolution", "16"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frozen weights changed: 0" in r.stdout


def test_opensora_stdit_training_example():
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_opensora_stdit.py",
         "--steps", "3", "--frames", "2", "--hidden", "32", "--heads", "2"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout


def test_unconditional_training_example(tmp_path):
    """examples/train_unconditional.py saves a loadable DDPMPipeline."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "ddpm_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_unconditional.py",
         "--steps", "3", "--batch", "2", "--resolution", "16",
         "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout and os.path.isdir(out)

    from paddlemix_tpu.diffusers import DiffusionPipeline
    pipe = DiffusionPipeline.from_pretrained(out)
    imgs = pipe(batch_size=1, num_inference_steps=2, output_type="np")[0]
    assert imgs.shape[0] == 1


def test_autoencoder_kl_training_example(tmp_path):
    """VAE rec+KL (+GAN after disc-start) example trains and saves."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "vae_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_autoencoder_kl.py",
         "--steps", "4", "--batch", "2", "--resolution", "32",
         "--disc-start", "2", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rec=" in r.stdout and "saved vae" in r.stdout
    # the adversarial term must be live after disc-start
    last = [ln for ln in r.stdout.splitlines() if "d=" in ln][-1]
    assert "d=0.0000" not in last


def test_svd_training_example(tmp_path):
    """EDM-preconditioned image-to-video fine-tune runs and saves."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "svd_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_image_to_video_svd.py",
         "--steps", "3", "--frames", "2", "--latent-size", "8",
         "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout and "saved svd unet" in r.stdout


def test_kandinsky_prior_training_example(tmp_path):
    import os
    import subprocess
    import sys

    out = str(tmp_path / "prior_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_kandinsky22.py",
         "--component", "prior", "--steps", "3", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved prior" in r.stdout

    from paddlemix_tpu.diffusers.models import PriorTransformer
    PriorTransformer.from_pretrained(out)


def test_kandinsky_decoder_training_example(tmp_path):
    import os
    import subprocess
    import sys

    out = str(tmp_path / "dec_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_kandinsky22.py",
         "--component", "decoder", "--steps", "3", "--batch", "2",
         "--latent-size", "8", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved decoder unet" in r.stdout


def test_lvdm_text2video_training_example(tmp_path):
    import os
    import subprocess
    import sys

    out = str(tmp_path / "lvdm_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_lvdm_text2video.py",
         "--steps", "3", "--frames", "2", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout and "saved lvdm unet" in r.stdout


def test_t2i_adapter_training_example(tmp_path):
    """Adapter-only gradients against a frozen UNet; loss falls and saves."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "adapter_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_t2i_adapter.py",
         "--steps", "3", "--batch", "2", "--resolution", "64",
         "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout and "saved adapter" in r.stdout


def test_animate_anyone_stage1_example():
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_animate_anyone.py",
         "--stage", "1", "--steps", "3"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout


def test_animate_anyone_stage2_freezes_base():
    """Stage 2 trains ONLY the motion modules."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_animate_anyone.py",
         "--stage", "2", "--frames", "2", "--steps", "3"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frozen weights changed: 0" in r.stdout


def test_stable_cascade_training_example(tmp_path):
    """Stage-C Wuerstchen-schedule prior training runs and saves."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "c_out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/examples/train_stable_cascade.py",
         "--steps", "3", "--output", out],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "loss=" in r.stdout and "saved stage-c unet" in r.stdout
