"""D6 — tree critic mirroring G6's topology without norms.

Reference: /root/reference/discriminators/discriminator_6_wgangp.py:
the G6 SE-bottleneck/RiR/DPN/DLA tree machinery with LeakyReLU(0.01) and
no BatchNorm (critic), plus 5x5 stride-2 reflect-pad downsamples
(:190-195) and a 4x4 head conv (:221). Trees at 32/16/8 with
dense_depth=1, level=2, block_num=2 (:198-218).
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models.blocks_rir import RiRTree


class Discriminator6WGANGP(nn.Module):
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        def down(v, feats, name):
            v = core.Conv(feats, 5, 2, 2, pad_mode="reflect",
                          dtype=self.dtype, name=name)(v)
            return core.leaky_relu(v, 0.01)

        x = down(x, 16, "Downsample_0")  # 32x32
        last = 16
        for i, (ip, op) in enumerate(((6, 12), (12, 16), (16, 24))):
            t = RiRTree(last, ip, op, 1, level=2, block_num=2, style="g6",
                        act="lrelu001", norm="none", dtype=self.dtype,
                        name=f"Tree_{i + 1}")
            x = t(x, train)
            last = t.get_out_planes()
            x = down(x, last, f"Downsample_{i + 1}")
        x = core.Conv(1, 4, 1, 0, dtype=self.dtype, name="LastConv")(x)
        return x.reshape(x.shape[0], -1)
