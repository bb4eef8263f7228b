"""D2 — DCGAN discriminator (sigmoid head).

Reference: /root/reference/discriminators/discriminator_2.py:6-35
(Conv(4,2,1,bias=False) + LeakyReLU(0.2); 3x [Conv + BN + LeakyReLU];
 Conv(ndf*8->1, 4,1,0, bias=False); flatten; Sigmoid).

`get_2` applies DCGAN weights_init (/root/reference/units/
get_discriminator.py:24), so dcgan_init defaults True.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Discriminator2(nn.Module):
    ndf: int = 64
    nc: int = 3
    dcgan_init: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        kinit = core.dcgan_kernel_init if self.dcgan_init else None
        sinit = core.dcgan_bn_scale_init if self.dcgan_init else nn.initializers.ones

        x = core.Conv(self.ndf, 4, 2, 1, use_bias=False, kernel_init=kinit,
                      dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        for mult in (2, 4, 8):
            x = core.Conv(self.ndf * mult, 4, 2, 1, use_bias=False,
                          kernel_init=kinit, dtype=self.dtype)(x)
            x = core.BatchNorm(use_running_average=not train, scale_init=sinit,
                               dtype=self.dtype)(x)
            x = core.leaky_relu(x, 0.2)
        x = core.Conv(1, 4, 1, 0, use_bias=False, kernel_init=kinit,
                      dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        return jax.nn.sigmoid(x)
