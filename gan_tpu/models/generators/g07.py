"""G7 — G6's tree machinery with PReLU, plain ConvT stem.

Reference: /root/reference/generators/generator_7.py:193-238.
Three ConvT+BN+PReLU upsamples to 16x16; (Tree level2 bn4) at 16, upsample,
(Tree level2 bn3) at 32, upsample, (Tree level1 bn2) at 64; 9x9 reflect
conv + Tanh.
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models.blocks_rir import RiRTree


class _Upsample(nn.Module):
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = core.ConvTranspose(self.features, self.kernel_size, self.stride,
                               self.padding, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return core.PReLU(dtype=self.dtype)(x)


class Generator7(nn.Module):
    z_dim: int = 256
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = _Upsample(256 * 4, 4, 1, 0, dtype=self.dtype)(x, train)  # 4x4
        x = _Upsample(256 * 2, dtype=self.dtype)(x, train)           # 8x8
        x = _Upsample(256, dtype=self.dtype)(x, train)               # 16x16

        t1 = RiRTree(256, 64, 64, 8, level=2, block_num=4, style="g6",
                     act="prelu", dtype=self.dtype)
        x = t1(x, train)
        last = t1.get_out_planes()
        x = _Upsample(last, dtype=self.dtype)(x, train)              # 32x32
        t2 = RiRTree(last, 32, 32, 4, level=2, block_num=3, style="g6",
                     act="prelu", dtype=self.dtype)
        x = t2(x, train)
        last = t2.get_out_planes()
        x = _Upsample(last, dtype=self.dtype)(x, train)              # 64x64
        t3 = RiRTree(last, 16, 16, 4, level=1, block_num=2, style="g6",
                     act="prelu", dtype=self.dtype)
        x = t3(x, train)
        x = core.Conv(3, 9, 1, 4, pad_mode="reflect", dtype=self.dtype)(x)
        return jnp.tanh(x)
