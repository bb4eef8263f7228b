"""G4 — ShuffleNet-style multi-kernel SE bottlenecks inside DLA trees.

Reference: /root/reference/generators/generator_4.py
- ShuffleBlock/SplitBlock (:9-27): channel shuffle (groups=4) and ratio
  splits.
- BasicBlock (:29-86): unify 1x1 (+IN+LReLU) when channels change; split x
  into quarters (xn, x3 | x5, x7); each of the 3/5/7 branches runs a
  1x1-expand (x4) -> depthwise kxk reflect-pad -> 1x1-reduce bottleneck with
  InstanceNorm, gated by an SE block on the globally-pooled output, residual
  add, concat + shuffle.
- Tree (:88-128): DLA recursion — level l aggregates prev_root(x), l-1
  subtree outputs and block_num chained blocks via a root block over the
  channel concat.
- Stem_block (:130-184): BatchNorm residual SE blocks + ConvT upsample x2.
- Generator (:186-228): ConvT(z->512, 4,2,1) to 2x2, two stems to 8x8,
  three (Tree, upsample) stages to 64x64, final Tree, 7x7 reflect conv, Tanh.
"""

from typing import Callable

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class _ConvGroup(nn.Module):
    """BasicBlock bottleneck: 1x1 expand -> depthwise kxk (reflect) -> 1x1
    reduce, InstanceNorm between (generator_4.py:32-42)."""

    planes: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        p = self.planes
        x = core.Conv(p, 1, 1, 0, dtype=self.dtype)(x)
        x = core.InstanceNorm(dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(p, self.kernel_size, 1, (self.kernel_size - 1) // 2,
                      groups=p, pad_mode="reflect", dtype=self.dtype)(x)
        x = core.InstanceNorm(dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(p // 4, 1, 1, 0, dtype=self.dtype)(x)
        x = core.InstanceNorm(dtype=self.dtype)(x)
        return x


class _SE(nn.Module):
    """SE gate on pooled features (generator_4.py:44-50)."""

    planes: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, pooled):
        x = core.Conv(self.planes, 1, dtype=self.dtype)(pooled)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(self.planes // 4, 1, dtype=self.dtype)(x)
        return nn.sigmoid(x)


class BasicBlock4(nn.Module):
    """generator_4.py:52-86."""

    in_planes: int
    planes: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        p = self.planes
        if self.in_planes != p:
            x = core.Conv(p, 1, 1, 0, dtype=self.dtype)(x)
            x = core.InstanceNorm(dtype=self.dtype)(x)
            x = core.leaky_relu(x, 0.2)
        q = p // 4
        xn, x3, x5, x7 = x[..., :q], x[..., q:2 * q], x[..., 2 * q:3 * q], x[..., 3 * q:]
        outs = []
        for branch, k in ((x3, 3), (x5, 5), (x7, 7)):
            out = _ConvGroup(p, k, dtype=self.dtype)(branch)
            gate = _SE(p, dtype=self.dtype)(core.global_avg_pool(out))
            outs.append(out * gate + branch)
        out = jnp.concatenate([*outs, xn], axis=-1)
        return core.channel_shuffle(out, 4)


class Tree4(nn.Module):
    """DLA tree recursion (generator_4.py:88-128). Unrolled at trace time;
    module construction order mirrors the reference exactly so the topology
    (and channel math) is identical."""

    in_planes: int
    planes: int
    level: int = 1
    block_num: int = 4
    origin: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        block = lambda ip, p, name: BasicBlock4(ip, p, dtype=self.dtype, name=name)
        xs = []
        # The reference constructs prev_root unconditionally but only *uses*
        # it when level > 1 (generator_4.py:93-97 vs :117) — level-1 trees
        # carry dead prev_root params. We call it and discard the output at
        # level 1: params match the reference, XLA dead-code-eliminates the
        # unused compute.
        prev_in = self.in_planes if self.origin else self.planes
        prev_out = block(prev_in, self.planes, "prev_root")(x)
        if self.level > 1:
            xs.append(prev_out)
        origin = self.origin
        for i in reversed(range(1, self.level)):
            sub_in = self.in_planes if origin else self.planes
            # reference quirk: subtrees do NOT inherit block_num — they get
            # the default 4 (generator_4.py:104-107 omits block_num)
            x = Tree4(sub_in, self.planes, level=i,
                      origin=origin, dtype=self.dtype, name=f"level_{i}")(x)
            origin = False
            xs.append(x)
        block0_in = self.in_planes if self.level == 1 else self.planes
        x = block(block0_in, self.planes, "block_0")(x)
        xs.append(x)
        for i in range(1, self.block_num):
            x = block(self.planes, self.planes, f"block_{i}")(x)
            xs.append(x)
        cat = jnp.concatenate(xs, axis=-1)
        return block(cat.shape[-1], self.planes, "root")(cat)


class StemBlock4(nn.Module):
    """generator_4.py:130-184: BN residual SE blocks + ConvT x2 upsample."""

    in_planes: int
    planes: int
    block_num: int = 3
    kernel_size: int = 3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        p = self.planes
        if self.in_planes != p:
            x = core.Conv(p, 1, 1, 0, dtype=self.dtype)(x)
            x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            x = core.leaky_relu(x, 0.2)
        for _ in range(self.block_num):
            out = core.Conv(p, 1, 1, 0, dtype=self.dtype)(x)
            out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
            out = core.leaky_relu(out, 0.2)
            out = core.Conv(p, self.kernel_size, 1, (self.kernel_size - 1) // 2,
                            groups=p, pad_mode="reflect", dtype=self.dtype)(out)
            out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
            out = core.leaky_relu(out, 0.2)
            out = core.Conv(p, 1, 1, 0, dtype=self.dtype)(out)
            out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
            gate = core.Conv(p, 1, dtype=self.dtype)(out)
            gate = core.leaky_relu(gate, 0.2)
            gate = core.Conv(p, 1, dtype=self.dtype)(gate)
            gate = nn.sigmoid(gate)
            x = x + out * gate
        x = core.ConvTranspose(p, 4, 2, 1, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return core.leaky_relu(x, 0.2)


class Generator4(nn.Module):
    """generator_4.py:186-228."""

    z_dim: int = 256
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        f = 512
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(f, 4, 2, 1, dtype=self.dtype)(x)  # 2x2
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = StemBlock4(f, f // 2, 3, 3, dtype=self.dtype)(x, train)      # 4x4
        x = StemBlock4(f // 2, f // 2, 4, 3, dtype=self.dtype)(x, train)  # 8x8
        for in_p, p in ((f // 2, f // 4), (f // 4, f // 8), (f // 8, f // 16)):
            x = Tree4(in_p, p, level=2, block_num=3, dtype=self.dtype)(x)
            x = core.ConvTranspose(p, 4, 2, 1, dtype=self.dtype)(x)
            x = core.InstanceNorm(dtype=self.dtype)(x)
            x = core.leaky_relu(x, 0.2)
        x = Tree4(f // 16, f // 16, level=2, block_num=3, dtype=self.dtype)(x)
        x = core.Conv(3, 7, 1, 3, pad_mode="reflect", dtype=self.dtype)(x)
        return jnp.tanh(x)
