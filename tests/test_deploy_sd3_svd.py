"""SD3 / SVD deploy exporter round-trips on tiny configs."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


def test_sd3_export(tmp_path):
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        AutoencoderKLConfig,
        SD3Transformer2DModel,
        SD3TransformerConfig,
    )

    tcfg = SD3TransformerConfig(
        sample_size=8, patch_size=2, in_channels=4, num_layers=1,
        attention_head_dim=8, num_attention_heads=2,
        joint_attention_dim=16, caption_projection_dim=16,
        pooled_projection_dim=16, out_channels=4, pos_embed_max_size=16)
    vcfg = AutoencoderKLConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(32,), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",))
    SD3Transformer2DModel.from_config(tcfg).save_pretrained(
        str(tmp_path / "ckpt" / "transformer"))
    AutoencoderKL.from_config(vcfg).save_pretrained(
        str(tmp_path / "ckpt" / "vae"))

    out = str(tmp_path / "export")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "deploy/sd3/export_model.py"),
         "--model-path", str(tmp_path / "ckpt"), "--output", out,
         "--height", "32", "--width", "32", "--text-len", "8"],
        capture_output=True, text=True, env=ENV, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "dit_step.jaxexport"))
    assert os.path.exists(os.path.join(out, "vae_decode.jaxexport"))

    # loaded computation runs
    import jax.numpy as jnp

    from paddlemix_tpu.deploy import load_fn
    from paddlemix_tpu.diffusers.models import SD3Transformer2DModel as M

    model = M.from_pretrained(os.path.join(out, "transformer"))
    fn = load_fn(os.path.join(out, "dit_step.jaxexport"))
    o = fn(model.params, jnp.zeros((2, 4, 4, 4), jnp.bfloat16),
           jnp.zeros((2,), jnp.float32), jnp.zeros((2, 8, 16), jnp.bfloat16),
           jnp.zeros((2, 16), jnp.bfloat16))
    assert np.asarray(o).shape == (2, 4, 4, 4)


def test_svd_export(tmp_path):
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKLTemporalDecoder,
        AutoencoderKLTemporalDecoderConfig,
        UNetSpatioTemporalConditionConfig,
        UNetSpatioTemporalConditionModel,
    )

    ucfg = UNetSpatioTemporalConditionConfig(
        sample_size=8, in_channels=8, out_channels=4,
        down_block_types=("CrossAttnDownBlockSpatioTemporal",
                          "DownBlockSpatioTemporal"),
        up_block_types=("UpBlockSpatioTemporal",
                        "CrossAttnUpBlockSpatioTemporal"),
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=16, num_attention_heads=(2, 2),
        transformer_layers_per_block=1, num_frames=2,
        addition_time_embed_dim=4,
        projection_class_embeddings_input_dim=12)
    vcfg = AutoencoderKLTemporalDecoderConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(32,), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",))
    UNetSpatioTemporalConditionModel.from_config(ucfg).save_pretrained(
        str(tmp_path / "ckpt" / "unet"))
    AutoencoderKLTemporalDecoder.from_config(vcfg).save_pretrained(
        str(tmp_path / "ckpt" / "vae"))

    out = str(tmp_path / "export")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "deploy/svd/export_model.py"),
         "--model-path", str(tmp_path / "ckpt"), "--output", out,
         "--frames", "2", "--height", "32", "--width", "32"],
        capture_output=True, text=True, env=ENV, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "unet_step.jaxexport"))
    assert os.path.exists(os.path.join(out, "vae_decode.jaxexport"))


def test_sd15_and_controlnet_export(tmp_path):
    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        AutoencoderKLConfig,
        ControlNetConfig,
        ControlNetModel,
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    kw = dict(sample_size=8, block_out_channels=(32, 32),
              down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
              up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
              layers_per_block=1, cross_attention_dim=16,
              attention_head_dim=2, norm_num_groups=8)
    UNet2DConditionModel.from_config(
        UNet2DConditionConfig.from_dict(kw)).save_pretrained(
        str(tmp_path / "ckpt" / "unet"))
    AutoencoderKL.from_config(AutoencoderKLConfig(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(32,), layers_per_block=1,
        down_block_types=("DownEncoderBlock2D",),
        up_block_types=("UpDecoderBlock2D",))).save_pretrained(
        str(tmp_path / "ckpt" / "vae"))
    ControlNetModel.from_config(ControlNetConfig.from_dict(
        dict(kw, conditioning_embedding_out_channels=(8, 8, 8, 8)))
    ).save_pretrained(str(tmp_path / "cn"))

    out = str(tmp_path / "sd15_export")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "deploy/sd15/export_model.py"),
         "--model-path", str(tmp_path / "ckpt"), "--output", out,
         "--height", "16", "--width", "16", "--text-len", "8"],
        capture_output=True, text=True, env=ENV, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out, "unet_step.jaxexport"))

    out2 = str(tmp_path / "cn_export")
    r = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "deploy/controlnet/export_model.py"),
         "--model-path", str(tmp_path / "ckpt"),
         "--controlnet-path", str(tmp_path / "cn"), "--output", out2,
         "--height", "16", "--width", "16", "--text-len", "8"],
        capture_output=True, text=True, env=ENV, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(out2, "cn_unet_step.jaxexport"))


def test_sdxl_export_and_infer(tmp_path):
    """deploy/sdxl export + static infer round trip on a tiny SDXL-style
    UNet (reference deploy infer.py drivers)."""
    import os
    import subprocess
    import sys

    import jax.numpy as jnp

    from paddlemix_tpu.diffusers.models import (
        AutoencoderKL,
        AutoencoderKLConfig,
        UNet2DConditionConfig,
        UNet2DConditionModel,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    unet = UNet2DConditionModel.from_config(UNet2DConditionConfig.from_dict(
        dict(sample_size=8, block_out_channels=(16, 32),
             down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
             up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
             layers_per_block=1, cross_attention_dim=16,
             attention_head_dim=2, norm_num_groups=8,
             addition_embed_type="text_time", addition_time_embed_dim=4,
             projection_class_embeddings_input_dim=4 * 6 + 8)))
    vae = AutoencoderKL.from_config(AutoencoderKLConfig(
        block_out_channels=(8, 16),
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2, layers_per_block=1,
        latent_channels=4, norm_num_groups=4))
    out = str(tmp_path / "export")
    unet.save_pretrained(os.path.join(out, "unet"))
    vae.save_pretrained(os.path.join(out, "vae"))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/sdxl/export_model.py"),
         "--model-path", out, "--output", out, "--height", "32",
         "--width", "32"],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]

    png = str(tmp_path / "out.png")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "deploy/sdxl/infer.py"),
         "--export-dir", out, "--steps", "2", "--height", "32",
         "--width", "32", "--random-context", "--output", png],
        capture_output=True, text=True, env=env, timeout=420)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(png) and "it/s" in r.stdout
