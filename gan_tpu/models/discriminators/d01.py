"""D1 — MLP discriminator with sigmoid head.

Reference: /root/reference/discriminators/discriminator_1.py:5-25
(flatten -> Linear 12288->256 -> LeakyReLU(0.2) -> Linear 256->64 ->
 LeakyReLU(0.2) -> Linear 64->1 -> Sigmoid).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Discriminator1(nn.Module):
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = core.Linear(256, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Linear(64, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Linear(1, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x)
