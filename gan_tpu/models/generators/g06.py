"""G6 — RiR dual-stream + DPN + DLA trees, GELU/BatchNorm.

Reference: /root/reference/generators/generator_6.py:407-459.
Stem_1 ConvT(z->128) to 2x2; StemBlocks (RiR streams) to 4x4 and 8x8;
three (Tree, ConvT-upsample) stages 8->16->32->64 with dense_depth=1;
LastBlock (RiR, no upsample) at 64; 9x9 reflect conv + Tanh.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models.blocks_rir import G6StemBlock, RiRTree


class Generator6(nn.Module):
    z_dim: int = 256
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        gelu = lambda v: jax.nn.gelu(v, approximate=False)
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(128, 4, 2, 1, dtype=self.dtype)(x)  # 2x2
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = gelu(x)
        x = G6StemBlock(64, 32, 2, 3, dtype=self.dtype)(x, train)  # 4x4
        x = G6StemBlock(32, 16, 2, 3, dtype=self.dtype)(x, train)  # 8x8

        last = 32
        for ip, op in ((8, 16), (4, 8), (4, 4)):
            t = RiRTree(last, ip, op, 1, level=2, block_num=2, style="g6",
                        act="gelu", dtype=self.dtype)
            x = t(x, train)
            last = t.get_out_planes()
            x = core.ConvTranspose(last, 4, 2, 1, dtype=self.dtype)(x)
            x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = gelu(x)
        x = G6StemBlock(4, 4, 2, 3, upsample=False, dtype=self.dtype)(x, train)
        x = core.Conv(3, 9, 1, 4, pad_mode="reflect", dtype=self.dtype)(x)
        return jnp.tanh(x)
