"""G2 — textbook DCGAN generator.

Reference: /root/reference/generators/generator_2.py:7-43
(5x ConvTranspose2d(4,...,bias=False), BatchNorm after the first four,
LeakyReLU(0.2), final Tanh; 1x1 -> 4 -> 8 -> 16 -> 32 -> 64).

The `get_2` factory applies DCGAN weights_init
(/root/reference/units/get_generators.py:21), so `dcgan_init=True` is the
factory default here too.
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Generator2(nn.Module):
    z_dim: int = 256
    ngf: int = 256
    nc: int = 3
    dcgan_init: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        kinit = core.dcgan_kernel_init if self.dcgan_init else None
        sinit = core.dcgan_bn_scale_init if self.dcgan_init else nn.initializers.ones

        x = z.reshape(z.shape[0], 1, 1, -1)
        specs = [
            (self.ngf * 8, 4, 1, 0),
            (self.ngf * 4, 4, 2, 1),
            (self.ngf * 2, 4, 2, 1),
            (self.ngf * 1, 4, 2, 1),
        ]
        for feats, k, s, p in specs:
            x = core.ConvTranspose(
                feats, k, s, p, use_bias=False, kernel_init=kinit, dtype=self.dtype
            )(x)
            x = core.BatchNorm(
                use_running_average=not train, scale_init=sinit, dtype=self.dtype
            )(x)
            x = core.leaky_relu(x, 0.2)
        x = core.ConvTranspose(
            self.nc, 4, 2, 1, use_bias=False, kernel_init=kinit, dtype=self.dtype
        )(x)
        return jnp.tanh(x)
