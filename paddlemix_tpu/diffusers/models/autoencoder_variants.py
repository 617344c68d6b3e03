"""VAE variants: AutoencoderTiny (TAESD), AsymmetricAutoencoderKL, and
ConsistencyDecoderVAE (DALL-E 3 decoder).

Rebuilds of the reference autoencoder family
(ppdiffusers/ppdiffusers/models/autoencoder_tiny.py, autoencoder_asym_kl.py +
vae.py:380-600 MaskCondition{Encoder,Decoder}, consistency_decoder_vae.py).
NHWC throughout; diffusers checkpoint keys load through the shared torch
conversion (index-dot -> underscore renames)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...core.config import BaseConfig
from ...core.modeling import PretrainedModel
from .autoencoder_kl import (
    AutoencoderKLConfig,
    DiagonalGaussian,
    Encoder,
    UpDecoderBlock2D,
    VAEMidBlock,
    _VAE_KEY_MAP,
)
from .embeddings import TimestepEmbedding, Timesteps
from .resnet import GroupNormAct, ResnetBlock2D


# ------------------------------------------------------------ AutoencoderTiny
@dataclasses.dataclass
class AutoencoderTinyConfig(BaseConfig):
    model_type = "autoencoder_tiny"
    in_channels: int = 3
    out_channels: int = 3
    encoder_block_out_channels: Tuple[int, ...] = (64, 64, 64, 64)
    decoder_block_out_channels: Tuple[int, ...] = (64, 64, 64, 64)
    num_encoder_blocks: Tuple[int, ...] = (1, 3, 3, 3)
    num_decoder_blocks: Tuple[int, ...] = (3, 3, 3, 1)
    latent_channels: int = 4
    upsampling_scaling_factor: int = 2
    latent_magnitude: float = 3.0
    latent_shift: float = 0.5
    scaling_factor: float = 1.0
    force_upcast: bool = False


class AutoencoderTinyBlock(nn.Module):
    """conv-relu x2 + conv with a 1x1 (or identity) skip, relu fuse
    (reference vae.py AutoencoderTinyBlock)."""

    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                            dtype=self.dtype, name="conv_0")(x))
        h = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                            dtype=self.dtype, name="conv_2")(h))
        h = nn.Conv(self.channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_4")(h)
        skip = x
        if x.shape[-1] != self.channels:
            skip = nn.Conv(self.channels, (1, 1), use_bias=False,
                           dtype=self.dtype, name="skip")(x)
        return nn.relu(h + skip)


class EncoderTiny(nn.Module):
    """[-1,1] image -> latents (reference vae.py:797-866 EncoderTiny, incl.
    the [-1,1]->[0,1] TAESD input convention). Submodule names mirror the
    torch Sequential indices (`layers_N`)."""

    config: AutoencoderTinyConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = (x + 1.0) / 2.0
        li = 0
        for i, n_blocks in enumerate(cfg.num_encoder_blocks):
            ch = cfg.encoder_block_out_channels[i]
            if i == 0:
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"layers_{li}")(x)
            else:
                x = nn.Conv(ch, (3, 3), strides=2, padding=1, use_bias=False,
                            dtype=self.dtype, name=f"layers_{li}")(x)
            li += 1
            for _ in range(n_blocks):
                x = AutoencoderTinyBlock(ch, dtype=self.dtype,
                                         name=f"layers_{li}")(x)
                li += 1
        return nn.Conv(cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=f"layers_{li}")(x)


class DecoderTiny(nn.Module):
    """latents -> [-1,1] image (reference vae.py:886-946 DecoderTiny: tanh
    clamp, blocks with nearest upsample, final conv)."""

    config: AutoencoderTinyConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        x = jnp.tanh(z / 3.0) * 3.0
        li = 0
        x = nn.Conv(cfg.decoder_block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name=f"layers_{li}")(x)
        li += 1  # the activation after conv_in occupies a Sequential slot
        x = nn.relu(x)
        li += 1
        s = cfg.upsampling_scaling_factor
        for i, n_blocks in enumerate(cfg.num_decoder_blocks):
            ch = cfg.decoder_block_out_channels[i]
            final = i == len(cfg.num_decoder_blocks) - 1
            for _ in range(n_blocks):
                x = AutoencoderTinyBlock(ch, dtype=self.dtype,
                                         name=f"layers_{li}")(x)
                li += 1
            if not final:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * s, w * s, c), method="nearest")
                li += 1  # nn.Upsample occupies a Sequential slot
            x = nn.Conv(cfg.out_channels if final else ch, (3, 3), padding=1,
                        use_bias=final, dtype=self.dtype,
                        name=f"layers_{li}")(x)
            li += 1
        return x * 2.0 - 1.0


class AutoencoderTinyModule(nn.Module):
    config: AutoencoderTinyConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = EncoderTiny(self.config, dtype=self.dtype)
        self.decoder = DecoderTiny(self.config, dtype=self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def scale_latents(self, x):
        """raw latents -> [0, 1] (diffusers AutoencoderTiny.scale_latents)."""
        cfg = self.config
        return jnp.clip(x / (2 * cfg.latent_magnitude) + cfg.latent_shift, 0, 1)

    def unscale_latents(self, x):
        cfg = self.config
        return (x - cfg.latent_shift) * (2 * cfg.latent_magnitude)

    def __call__(self, x):
        return self.decode(self.encode(x))


class AutoencoderTiny(PretrainedModel):
    config_class = AutoencoderTinyConfig
    module_class = AutoencoderTinyModule
    torch_key_map = (
        # torch: encoder.layers.N... (Sequential) -> encoder.layers_N
        (r"^(encoder|decoder)\.layers\.(\d+)\.", r"\1.layers_\2."),
        # TinyBlock internals: conv.0/conv.2/conv.4 + skip
        (r"\.conv\.(\d+)\.", r".conv_\1."),
        (r"\.weight$", r".kernel"),
    )

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.encoder_block_out_channels) - 1)
        return (jnp.zeros((1, 4 * f, 4 * f, config.in_channels)),), {}

    def encode(self, x):
        return self.module.apply({"params": self.params}, x,
                                 method=self.module.encode)

    def decode(self, z):
        return self.module.apply({"params": self.params}, z,
                                 method=self.module.decode)


# ------------------------------------------------- AsymmetricAutoencoderKL
@dataclasses.dataclass
class AsymmetricAutoencoderKLConfig(BaseConfig):
    model_type = "asymmetric_autoencoder_kl"
    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Tuple[str, ...] = ("DownEncoderBlock2D",) * 4
    down_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_down_block: int = 2
    up_block_types: Tuple[str, ...] = ("UpDecoderBlock2D",) * 4
    up_block_out_channels: Tuple[int, ...] = (192, 384, 768, 768)
    layers_per_up_block: int = 3
    latent_channels: int = 4
    norm_num_groups: int = 32
    sample_size: int = 256
    scaling_factor: float = 0.18215

    @property
    def encoder_config(self) -> AutoencoderKLConfig:
        return AutoencoderKLConfig(
            in_channels=self.in_channels,
            block_out_channels=self.down_block_out_channels,
            layers_per_block=self.layers_per_down_block,
            latent_channels=self.latent_channels,
            norm_num_groups=self.norm_num_groups)


class MaskConditionEncoder(nn.Module):
    """Shape-pyramid encoder of the masked image (reference vae.py:380-424
    MaskConditionEncoder): returns features keyed by spatial size."""

    out_ch: int
    res_ch: int
    stride: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch, res_ch, stride = self.out_ch, self.res_ch, self.stride
        channels = []
        while stride > 1:
            stride //= 2
            in_ch_ = out_ch * 2
            if out_ch > res_ch:
                out_ch = res_ch
            if stride == 1:
                in_ch_ = res_ch
            channels.append((in_ch_, out_ch))
            out_ch *= 2
        out_channels = [oc for _, oc in channels] + [channels[-1][0]]
        feats = {}
        for li, ch in enumerate(out_channels):
            if li in (0, 1):
                x = nn.Conv(ch, (3, 3), strides=1, padding=1,
                            dtype=self.dtype, name=f"layers_{li}")(x)
            else:
                x = nn.Conv(ch, (4, 4), strides=2, padding=1,
                            dtype=self.dtype, name=f"layers_{li}")(x)
            # keyed by (spatial, channels) — the reference keys by the full
            # shape string (vae.py:419); later layers overwrite same-key
            feats[(x.shape[1], x.shape[-1])] = x
            x = nn.relu(x)
        return feats


class MaskConditionDecoder(nn.Module):
    """Decoder blending masked-image features at every scale (reference
    vae.py:426-600): the inpainting-specialized half of the asymmetric VAE."""

    config: AsymmetricAutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, image=None, mask=None):
        cfg = self.config
        g = cfg.norm_num_groups
        rev = list(reversed(cfg.up_block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        x = VAEMidBlock(rev[0], True, groups=g, dtype=self.dtype,
                        name="mid_block")(x)
        im_x = {}
        if image is not None and mask is not None:
            im_x = MaskConditionEncoder(
                out_ch=cfg.up_block_out_channels[0],
                res_ch=cfg.up_block_out_channels[-1],
                dtype=self.dtype, name="condition_encoder")((1 - mask) * image)
        def blend(x):
            sample_ = im_x.get((x.shape[1], x.shape[-1]))
            if sample_ is None:
                return x
            mask_ = jax.image.resize(mask, (*x.shape[:3], mask.shape[-1]),
                                     method="nearest")
            return x * mask_ + sample_ * (1 - mask_)

        for i, ch in enumerate(rev):
            if im_x:
                x = blend(x)
            last = i == len(rev) - 1
            x = UpDecoderBlock2D(ch, cfg.layers_per_up_block + 1,
                                 add_upsample=not last, groups=g,
                                 dtype=self.dtype, name=f"up_blocks_{i}")(x)
        if im_x:
            x = blend(x)
        x = GroupNormAct(groups=g, eps=1e-6, dtype=self.dtype,
                         name="conv_norm_out")(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)


class AsymmetricAutoencoderKLModule(nn.Module):
    config: AsymmetricAutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config.encoder_config, dtype=self.dtype)
        self.decoder = MaskConditionDecoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z, image=None, mask=None):
        return self.decoder(self.post_quant_conv(z), image=image, mask=mask)

    def __call__(self, x, mask=None, key=None):
        posterior = self.encode(x)
        z = posterior.sample(key) if key is not None else posterior.mode()
        return self.decode(z, image=x, mask=mask), posterior


class AsymmetricAutoencoderKL(PretrainedModel):
    config_class = AsymmetricAutoencoderKLConfig
    module_class = AsymmetricAutoencoderKLModule
    torch_key_map = _VAE_KEY_MAP

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.down_block_out_channels) - 1)
        s = 4 * f
        return (jnp.zeros((1, s, s, config.in_channels)),
                jnp.ones((1, s, s, 1))), {}

    def encode(self, x):
        return self.module.apply({"params": self.params}, x,
                                 method=self.module.encode)

    def decode(self, z, image=None, mask=None):
        return self.module.apply({"params": self.params}, z, image, mask,
                                 method=self.module.decode)


# --------------------------------------------------- ConsistencyDecoderVAE
@dataclasses.dataclass
class ConsistencyDecoderVAEConfig(BaseConfig):
    model_type = "consistency_decoder_vae"
    scaling_factor: float = 0.18215
    latent_channels: int = 4
    encoder_block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    encoder_layers_per_block: int = 2
    encoder_norm_num_groups: int = 32
    decoder_block_out_channels: Tuple[int, ...] = (320, 640, 1024, 1024)
    decoder_layers_per_block: int = 3
    decoder_norm_num_groups: int = 32
    decoder_norm_eps: float = 1e-05
    decoder_in_channels: int = 7   # 3 noise + latent_channels upsampled
    decoder_out_channels: int = 6  # mean + (unused) variance; [:3] is used
    decoder_num_train_timesteps: int = 1024

    @property
    def encoder_config(self) -> AutoencoderKLConfig:
        return AutoencoderKLConfig(
            block_out_channels=self.encoder_block_out_channels,
            layers_per_block=self.encoder_layers_per_block,
            latent_channels=self.latent_channels,
            norm_num_groups=self.encoder_norm_num_groups)


class _ResnetDownsample(nn.Module):
    """diffusers ResnetBlock2D(down=True): avg-pool downsample applied to
    both branch and shortcut (the consistency decoder's downsampler)."""

    channels: int
    groups: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNormAct(groups=self.groups, eps=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None]
        h = GroupNormAct(groups=self.groups, eps=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class _ResnetUpsample(nn.Module):
    """diffusers ResnetBlock2D(up=True): nearest-x2 upsample on both
    branches."""

    channels: int
    groups: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        def up(v):
            b, h, w, c = v.shape
            return jax.image.resize(v, (b, 2 * h, 2 * w, c), method="nearest")

        h = GroupNormAct(groups=self.groups, eps=self.eps, dtype=self.dtype,
                         name="norm1")(x)
        h = up(h)
        x = up(x)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None]
        h = GroupNormAct(groups=self.groups, eps=self.eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class _CDDownBlock(nn.Module):
    """ResnetDownsampleBlock2D: L resnets + a downsampling resnet."""

    channels: int
    num_layers: int
    groups: int
    eps: float
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        skips = []
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.channels, groups=self.groups, eps=self.eps,
                              dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            skips.append(x)
        if self.add_downsample:
            x = _ResnetDownsample(self.channels, self.groups, self.eps,
                                  dtype=self.dtype,
                                  name="downsamplers_0")(x, temb)
            skips.append(x)
        return x, skips


class _CDUpBlock(nn.Module):
    """ResnetUpsampleBlock2D: (L+1) skip-concat resnets + upsampling resnet."""

    channels: int
    num_layers: int
    groups: int
    eps: float
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb):
        for j in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.channels, groups=self.groups, eps=self.eps,
                              dtype=self.dtype, name=f"resnets_{j}")(x, temb)
        if self.add_upsample:
            x = _ResnetUpsample(self.channels, self.groups, self.eps,
                                dtype=self.dtype, name="upsamplers_0")(x, temb)
        return x


class _CDMidBlock(nn.Module):
    channels: int
    groups: int
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        x = ResnetBlock2D(self.channels, groups=self.groups, eps=self.eps,
                          dtype=self.dtype, name="resnets_0")(x, temb)
        return ResnetBlock2D(self.channels, groups=self.groups, eps=self.eps,
                             dtype=self.dtype, name="resnets_1")(x, temb)


class ConsistencyDecoderUNet(nn.Module):
    """The UNet2DModel inside the consistency decoder (reference
    consistency_decoder_vae.py:88-140 decoder_unet config): skip-connected
    ResnetDownsample/Upsample blocks, no attention."""

    config: ConsistencyDecoderVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps):
        cfg = self.config
        chans = cfg.decoder_block_out_channels
        g = cfg.decoder_norm_num_groups
        eps = cfg.decoder_norm_eps
        L = cfg.decoder_layers_per_block
        temb = Timesteps(chans[0], flip_sin_to_cos=True,
                         downscale_freq_shift=0.0, name="time_proj")(timesteps)
        temb = TimestepEmbedding(chans[0] * 4, dtype=self.dtype,
                                 name="time_embedding")(temb)
        x = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        skips = [x]
        for i, ch in enumerate(chans):
            x, blk_skips = _CDDownBlock(
                ch, L, g, eps, add_downsample=i < len(chans) - 1,
                dtype=self.dtype, name=f"down_blocks_{i}")(x, temb)
            skips.extend(blk_skips)
        x = _CDMidBlock(chans[-1], g, eps, dtype=self.dtype,
                        name="mid_block")(x, temb)
        for i, ch in enumerate(reversed(chans)):
            n = L + 1
            x = _CDUpBlock(ch, n, g, eps, add_upsample=i < len(chans) - 1,
                           dtype=self.dtype,
                           name=f"up_blocks_{i}")(x, skips[-n:], temb)
            del skips[-n:]
        x = GroupNormAct(groups=g, eps=eps, dtype=self.dtype,
                         name="conv_norm_out")(x)
        return nn.Conv(cfg.decoder_out_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(x)


class ConsistencyDecoderVAEModule(nn.Module):
    config: ConsistencyDecoderVAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config.encoder_config, dtype=self.dtype)
        self.decoder_unet = ConsistencyDecoderUNet(self.config,
                                                   dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        # DALL-E 3 latent whitening stats (consistency_decoder_vae.py:316)
        self.means = self.param("means", nn.initializers.zeros, (1, 1, 1, 4))
        self.stds = self.param("stds", nn.initializers.ones, (1, 1, 1, 4))

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return DiagonalGaussian(mean, logvar)

    def decode(self, z, key, num_inference_steps: int = 2):
        """2-step consistency sampling (reference decode :308-342): whiten,
        nearest-upsample to pixel grid, iterate UNet + consistency step.
        The step loop is unrolled (2 steps) inside one jit."""
        from ..schedulers.scheduling_specialty import (
            ConsistencyDecoderConfig,
            ConsistencyDecoderScheduler,
        )

        cfg = self.config
        z = (z * cfg.scaling_factor - self.means) / self.stds
        f = 2 ** (len(cfg.encoder_block_out_channels) - 1)
        b, h, w, c = z.shape
        z = jax.image.resize(z, (b, h * f, w * f, c), method="nearest")
        sched = ConsistencyDecoderScheduler(ConsistencyDecoderConfig(
            num_train_timesteps=cfg.decoder_num_train_timesteps))
        state = sched.set_timesteps(num_inference_steps)
        key, k0 = jax.random.split(key)
        x_t = sched.init_noise_sigma * jax.random.normal(
            k0, (b, h * f, w * f, 3), self.dtype)
        for i in range(num_inference_steps):
            key, ki = jax.random.split(key)
            t = jnp.broadcast_to(state.timesteps[i], (b,))
            model_in = jnp.concatenate(
                [sched.scale_model_input(state, x_t, i).astype(z.dtype), z],
                axis=-1)
            out = self.decoder_unet(model_in, t)[..., :3]
            x_t, state = sched.step(state, out, i, x_t,
                                    key=ki if i < num_inference_steps - 1 else None)
        return x_t

    def __call__(self, x, key):
        posterior = self.encode(x)
        return self.decode(posterior.mode(), key), posterior


class ConsistencyDecoderVAE(PretrainedModel):
    config_class = ConsistencyDecoderVAEConfig
    module_class = ConsistencyDecoderVAEModule
    torch_key_map = (
        (r"\.to_out\.0\.", r".to_out."),
        (r"\.(\d+)\.", r"_\1."),
        (r"(^|\.)((conv_)?norm[^.]*|group_norm)\.weight$", r"\1\2.scale"),
        (r"\.weight$", r".kernel"),
    )

    @classmethod
    def example_inputs(cls, config):
        f = 2 ** (len(config.encoder_block_out_channels) - 1)
        s = 4 * f
        return (jnp.zeros((1, s, s, 3)), jax.random.PRNGKey(0)), {}

    def encode(self, x):
        return self.module.apply({"params": self.params}, x,
                                 method=self.module.encode)

    def decode(self, z, key=None, num_inference_steps: int = 2):
        return self.module.apply(
            {"params": self.params}, z,
            key if key is not None else jax.random.PRNGKey(0),
            num_inference_steps, method=self.module.decode)
