"""D3 family — DCGAN-shaped critics (no sigmoid).

- Discriminator3WGANGP: /root/reference/discriminators/
  discriminator_3_wgangp.py:15-42 — Conv(4,2,1,bias=False)+PReLU x4, head
  Conv(ndf*8 -> 1, 4,1,0, bias=False), no BatchNorm. (The file also defines
  an unused ProGAN StandardDeviation, :4-13 — intentionally not wired here.)
- Discriminator3WGANGPSN: /root/reference/discriminators/
  discriminator_3_wgangpsn.py:8-35 — same trunk but every conv wrapped in
  spectral_norm and LeakyReLU(0.2) activations.
- Discriminator3ProGAN: /root/reference/discriminators/
  discriminator_3_wgangp_progan.py:31-70 — equalized convs, 1x1 fromRGB,
  paired stride-1/stride-2 3x3 blocks, minibatch StandardDeviation before
  the 4x4 head.
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Discriminator3WGANGP(nn.Module):
    ndf: int = 128
    nc: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        for mult in (1, 2, 4, 8):
            x = core.Conv(self.ndf * mult, 4, 2, 1, use_bias=False,
                          dtype=self.dtype)(x)
            x = core.PReLU(dtype=self.dtype)(x)
        x = core.Conv(1, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)
        return x.reshape(x.shape[0], -1)


class Discriminator3WGANGPSN(nn.Module):
    ndf: int = 64
    nc: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        for mult in (1, 2, 4, 8):
            x = core.SNConv(self.ndf * mult, 4, 2, 1, use_bias=False,
                            dtype=self.dtype)(x, update_stats=update_sn)
            x = core.leaky_relu(x, 0.2)
        x = core.SNConv(1, 4, 1, 0, use_bias=False, dtype=self.dtype)(
            x, update_stats=update_sn)
        return x.reshape(x.shape[0], -1)


class Discriminator3ProGAN(nn.Module):
    ndf: int = 64
    nc: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        ndf = self.ndf
        x = core.EqualizedConv(ndf, 1, 1, 0, dtype=self.dtype)(x)
        x = core.PReLU(dtype=self.dtype)(x)
        x = core.EqualizedConv(ndf, 3, 1, 1, dtype=self.dtype)(x)
        x = core.PReLU(dtype=self.dtype)(x)
        x = core.EqualizedConv(ndf, 3, 2, 1, dtype=self.dtype)(x)
        x = core.PReLU(dtype=self.dtype)(x)
        for mult in (2, 4, 8):
            x = core.EqualizedConv(ndf * mult, 3, 1, 1, dtype=self.dtype)(x)
            x = core.PReLU(dtype=self.dtype)(x)
            x = core.EqualizedConv(ndf * mult, 3, 2, 1, dtype=self.dtype)(x)
            x = core.PReLU(dtype=self.dtype)(x)
        x = core.progan_stddev(x)
        x = core.EqualizedConv(ndf * 8, 3, 1, 1, dtype=self.dtype)(x)
        x = core.PReLU(dtype=self.dtype)(x)
        x = core.EqualizedConv(ndf * 8, 4, 1, 0, dtype=self.dtype)(x)
        x = core.PReLU(dtype=self.dtype)(x)
        x = core.EqualizedConv(1, 1, 1, 0, dtype=self.dtype)(x)
        return x.reshape(x.shape[0], -1)
