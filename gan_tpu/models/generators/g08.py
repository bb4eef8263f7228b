"""G8/G9/G10/G10_2/G11 — the stage-skip-concat RiR/DPN tree generators.

All five share the same Generator skeleton
(/root/reference/generators/generator_8.py:193-260): ConvT stem to 4x4/8x8,
then four stages of [upsample -> Tree -> concat(x, tree(x)) -> (attention)]
ending at 64x64, then a 9x9 reflect conv + Tanh. They differ in planes,
tree shape, attention placement, conv type and norm:

| model  | planes | trees (level,bn) | attention       | conv      | norm    | ref |
|--------|--------|------------------|-----------------|-----------|---------|-----|
| G8     | 64     | 2,4/2,4/1,3/1,2  | none            | plain     | bn      | generator_8.py |
| G9     | 48     | same as G8       | stage + tree    | plain     | bn      | generator_9.py:230-307 |
| G10    | 64     | 1,2 x4           | stage + block   | plain     | bn      | generator_10.py:216-293 |
| G10_2  | 32     | 2,1 x4           | stage + block   | equalized | bn      | generator_10_2.py:240-320 |
| G11    | 64     | 1,1 x4           | stage + block   | equalized | pixnorm | generator_11.py:323-404 |

G8/G9 use the g6 tree concat style with branches (3,5,7); G10+ use the g10
style with a single 3-branch. G11's upsample is EqualizedConvT + Pixnorm +
PReLU (generator_11.py:326-331); others are plain ConvT + BN + PReLU.
"""

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models.blocks_rir import RiRTree, SelfAttention


class _Upsample(nn.Module):
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    equalized: bool = False  # G11: EqualizedConvT + Pixnorm
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.equalized:
            x = core.EqualizedConvTranspose(
                self.features, self.kernel_size, self.stride, self.padding,
                dtype=self.dtype)(x)
            x = core.PixNorm()(x)
        else:
            x = core.ConvTranspose(self.features, self.kernel_size,
                                   self.stride, self.padding, dtype=self.dtype)(x)
            x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return core.PReLU(dtype=self.dtype)(x)


class SkipTreeGenerator(nn.Module):
    """Shared skeleton for G8..G11."""

    z_dim: int = 256
    planes: int = 64
    tree_shapes: Sequence[Tuple[int, int]] = ((2, 4), (2, 4), (1, 3), (1, 2))
    style: str = "g6"
    branches: Sequence[int] = (3, 5, 7)
    stage_attention: bool = False
    root_attention: bool = False
    block_attention: bool = False
    attention_gamma: Tuple[float, float] = (0.03, 0.23)
    stage_gamma: Optional[Tuple[float, float]] = None
    conv_equalized: bool = False
    norm: str = "bn"
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        # G11's get_upsample (generator_11.py:326-331) swaps in equalized
        # ConvT + Pixnorm for every upsample incl. the first; G10_2 keeps
        # plain ConvT + BN despite its equalized convs.
        ups_eq = self.conv_equalized and self.norm == "pixnorm"
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = _Upsample(p * 16, 4, 1, 0, equalized=ups_eq, dtype=self.dtype)(x, train)
        stage_in = [p * 8, p * 4, p * 2, p]
        tree_args = [
            # (in_planes, out_planes, dense_depth)
            (p * 2, p * 2, p // 4),
            (p, p, p // 8),
            (p // 2, p // 2, p // 16),
            (p // 4, p // 4, p // 32),
        ]
        last = p * 16
        for i in range(4):
            x = _Upsample(stage_in[i], 4, 2, 1, equalized=ups_eq,
                          dtype=self.dtype)(x, train)
            ip, op, dd = tree_args[i]
            lvl, bn = self.tree_shapes[i]
            t = RiRTree(stage_in[i], ip, op, dd, level=lvl, block_num=bn,
                        style=self.style, branches=self.branches,
                        act="prelu", conv_equalized=self.conv_equalized,
                        norm=self.norm, root_attention=self.root_attention,
                        block_attention=self.block_attention,
                        attention_gamma=self.attention_gamma, dtype=self.dtype,
                        name=f"Tree_{i + 1}")
            tx = t(x, train)
            x = jnp.concatenate([x, tx], axis=-1)
            last = t.get_out_planes() + stage_in[i]
            if self.stage_attention:
                x = SelfAttention(
                    last,
                    gamma_init=self.stage_gamma or self.attention_gamma,
                    equalized=self.conv_equalized, dtype=self.dtype,
                    name=f"Attention_{i + 1}",
                )(x)
        x = core.EqualizedConv(3, 9, 1, 4, pad_mode="reflect",
                               dtype=self.dtype)(x) if self.conv_equalized else \
            core.Conv(3, 9, 1, 4, pad_mode="reflect", dtype=self.dtype)(x)
        return jnp.tanh(x)


def Generator8(z_dim: int = 256, dtype=None):
    return SkipTreeGenerator(z_dim=z_dim, planes=64, dtype=dtype)


def Generator9(z_dim: int = 256, dtype=None):
    return SkipTreeGenerator(
        z_dim=z_dim, planes=48,
        stage_attention=True, root_attention=True,
        stage_gamma=(0.1, 0.1), dtype=dtype,
    )


def Generator10(z_dim: int = 256, dtype=None):
    return SkipTreeGenerator(
        z_dim=z_dim, planes=64, tree_shapes=((1, 2),) * 4, style="g10",
        branches=(3,), stage_attention=True, block_attention=True,
        attention_gamma=(0.03, 0.23), dtype=dtype,
    )


def Generator10_2(z_dim: int = 256, dtype=None):
    return SkipTreeGenerator(
        z_dim=z_dim, planes=32, tree_shapes=((2, 1),) * 4, style="g10",
        branches=(3,), stage_attention=True, block_attention=True,
        attention_gamma=(0.03, 0.23), conv_equalized=True, dtype=dtype,
    )


def Generator11(z_dim: int = 256, dtype=None):
    return SkipTreeGenerator(
        z_dim=z_dim, planes=64, tree_shapes=((1, 1),) * 4, style="g10",
        branches=(3,), stage_attention=True, block_attention=True,
        attention_gamma=(0.03, 0.23), conv_equalized=True, norm="pixnorm",
        dtype=dtype,
    )
