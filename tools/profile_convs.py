"""Conv + norm profiling at SDXL UNet/VAE shapes (NHWC, bf16)."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from flax import linen as nn

from calibrate_timing import timed


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # SDXL UNet conv shapes (batch 2 = CFG)
    shapes = [
        (2, 128, 128, 320, 320),   # level-0 resnets
        (2, 64, 64, 640, 640),     # level-1 resnets
        (2, 32, 32, 1280, 1280),   # level-2 resnets
        (2, 128, 128, 320, 4),     # conv_out
        # VAE decoder shapes (batch 1)
        (1, 1024, 1024, 128, 128),
        (1, 512, 512, 256, 256),
        (1, 256, 256, 512, 512),
        (1, 128, 128, 512, 512),
    ]
    for (b, h, w, cin, cout) in shapes:
        x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
        conv = nn.Conv(cout, (3, 3), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16)
        p = conv.init(key, x)
        fl = 2 * b * h * w * 9 * cin * cout
        timed(lambda p, x: conv.apply(p, x), p, x, flops=fl,
              label=f"conv3x3 {b}x{h}x{w}x{cin}->{cout}")

    # groupnorm+silu at level-0 (the elementwise tax per resnet)
    x = jax.random.normal(key, (2, 128, 128, 320), jnp.bfloat16)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.bfloat16)
    p = gn.init(key, x)
    timed(lambda p, x: nn.silu(gn.apply(p, x)), p, x,
          bytes_moved=2 * x.size * 2, label="groupnorm+silu 2x128x128x320")

    # full resnet block
    from paddlemix_tpu.diffusers.models.resnet import ResnetBlock2D
    blk = ResnetBlock2D(320, dtype=jnp.bfloat16)
    temb = jax.random.normal(key, (2, 1280), jnp.bfloat16)
    p = blk.init(key, x, temb)
    fl = 2 * 2 * 2 * 128 * 128 * 9 * 320 * 320
    timed(lambda p, x, t: blk.apply(p, x, t), p, x, temb, flops=fl,
          label="ResnetBlock2D 2x128x128x320")


if __name__ == "__main__":
    main()
