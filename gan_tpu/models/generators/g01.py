"""G1 — 3-layer MLP generator.

Reference: /root/reference/generators/generator_1.py:5-29
(Linear z->256 -> LeakyReLU(0.2) -> Linear 256->512 -> LeakyReLU(0.2)
 -> Linear 512->H*W*C -> Tanh -> reshape).

TPU-native deltas: z is (B, nz) flat; output is NHWC (B, H, W, C).
"""

from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Generator1(nn.Module):
    z_dim: int = 256
    image_size: Tuple[int, int, int] = (64, 64, 3)  # (H, W, C)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        h, w, c = self.image_size
        x = z.reshape(z.shape[0], -1)
        x = core.Linear(256, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Linear(512, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Linear(h * w * c, dtype=self.dtype)(x)
        x = jnp.tanh(x)
        return x.reshape(z.shape[0], h, w, c)
