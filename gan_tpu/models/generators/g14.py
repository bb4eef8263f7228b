"""G14 — minimal selective-kernel generator (no style, no trees).

Reference: /root/reference/generators/generator_14.py:310-328 (planes=32):
GeneratorStart = ConvT(z->8p, 4,1,0) + BN + PReLU + 2x[EqConv3+BN+PReLU]
(:281-307); four GeneratorBlocks = SKConvT + SKConv(in,in) + SKConv(in,out)
(:263-278); final EqualizedConv k5 to rgb (:319). No Tanh. SK stacks use
the deep V13_4 depths with trailing fc_sub BN (:41-134).
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk
from gan_tpu.models.generators.g13_3 import SKConvPlain


class Generator14(nn.Module):
    z_dim: int = 256
    planes: int = 32
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        st = sk.V13_4
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(p * 8, 4, 1, 0, dtype=self.dtype,
                               name="start_convT")(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="start_bn")(x)
        x = core.PReLU(channels=p * 8, dtype=self.dtype,
                       name="start_activation")(x)
        for i in (1, 2):
            x = sk.EqualizedConvRep(p * 8, 3, dtype=self.dtype,
                                    name=f"start_conv{i}")(x)
            x = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name=f"start_conv{i}_bn")(x)
            x = core.PReLU(channels=p * 8, dtype=self.dtype,
                           name=f"start_conv{i}_act")(x)

        stages = [
            (p * 8, p * 4, 8),
            (p * 4, p * 2, 16),
            (p * 2, p * 2, 32),
            (p * 2, p * 1, 64),
        ]
        for i, (ip, op, size) in enumerate(stages):
            x = sk.SKConvT(style=st, dtype=self.dtype,
                           name=f"block{i + 1}_upsample")(x, train)
            x = SKConvPlain(ip, 2, size, style=st, dtype=self.dtype,
                            name=f"block{i + 1}_convs_1")(x, train)
            x = SKConvPlain(op, 2, size, style=st, dtype=self.dtype,
                            name=f"block{i + 1}_convs_2")(x, train)
        return sk.EqualizedConvRep(3, 5, dtype=self.dtype, name="to_rgb")(x)
