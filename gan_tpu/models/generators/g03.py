"""G3 — DCGAN with PReLU ("progan" file; its equalized layers are defined
but the committed model uses plain ConvTranspose2d).

Reference: /root/reference/generators/generator_3_progan.py:33-55
(get_upsample = ConvTranspose2d + BatchNorm2d + PReLU; stack of 5 with the
last emitting 3 channels, then Tanh).
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Generator3ProGAN(nn.Module):
    z_dim: int = 256
    ngf: int = 256
    nc: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z.reshape(z.shape[0], 1, 1, -1)
        specs = [
            (self.ngf * 8, 4, 1, 0),
            (self.ngf * 4, 4, 2, 1),
            (self.ngf * 2, 4, 2, 1),
            (self.ngf * 1, 4, 2, 1),
            (3, 4, 2, 1),
        ]
        for feats, k, s, p in specs:
            x = core.ConvTranspose(feats, k, s, p, dtype=self.dtype)(x)
            x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = core.PReLU(dtype=self.dtype)(x)
        return jnp.tanh(x)
