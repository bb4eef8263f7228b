"""G5 — DPN (dual-path: residual + dense concat) multi-kernel SE bottlenecks
in DLA trees.

Reference: /root/reference/generators/generator_5.py
- BasicBlock (:5-90): three bottlenecks (1x1 -> depthwise {3,5,7} reflect ->
  1x1 to out+dense_depth) each SE-gated; output = concat of
  [residual sum over the first `out_planes` channels, the dense tails of
  x/out3/out5/out7]. Channel math: get_out_planes() (:30-37).
- Tree (:92-156): DLA recursion over DPN blocks; roots see
  out*(block_num-1) + chained widths.
- Stem_block (:158-220): BN bottleneck + SE residual stack, shortcut 1x1 on
  width change, ConvT x2 upsample.
- Generator (:222-267): ConvT(z->512) to 2x2, stems to 8x8, trees at
  8/16/32/64 with (in,out,dd) = (64,128,16)/(32,64,12)/(16,32,8)/(8,16,4),
  final 9x9 reflect conv + Tanh.
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class BasicBlock5(nn.Module):
    """generator_5.py:5-90 (channel bookkeeping preserved exactly)."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    root: bool = False
    is_unify: bool = False
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        if self.is_unify or self.root:
            return self.out_planes + 4 * self.dense_depth
        return self.last_planes + 3 * self.dense_depth

    def _bottleneck(self, x, kernel_size):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        x = core.Conv(ip, 1, 1, 0, dtype=self.dtype)(x)
        x = core.InstanceNorm(dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(ip, kernel_size, 1, (kernel_size - 1) // 2,
                      groups=ip, pad_mode="reflect", dtype=self.dtype)(x)
        x = core.InstanceNorm(dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(od, 1, 1, 0, dtype=self.dtype)(x)
        x = core.InstanceNorm(dtype=self.dtype)(x)
        return x

    def _se(self, out):
        gate = core.global_avg_pool(out)
        gate = core.Conv(self.in_planes, 1, dtype=self.dtype)(gate)
        gate = core.leaky_relu(gate, 0.2)
        gate = core.Conv(self.out_planes + self.dense_depth, 1, dtype=self.dtype)(gate)
        return nn.sigmoid(gate)

    @nn.compact
    def __call__(self, x):
        od = self.out_planes + self.dense_depth
        if self.is_unify:
            x = core.Conv(od, 1, 1, 0, dtype=self.dtype)(x)
            x = core.InstanceNorm(dtype=self.dtype)(x)
        outs = []
        for k in (3, 5, 7):
            out = self._bottleneck(x, k)
            outs.append(out * self._se(out))
        if self.root:
            x = core.Conv(od, 1, 1, 0, dtype=self.dtype)(x)
            x = core.InstanceNorm(dtype=self.dtype)(x)
        d = self.out_planes
        out3, out5, out7 = outs
        return jnp.concatenate(
            [
                x[..., :d] + out3[..., :d] + out5[..., :d] + out7[..., :d],
                x[..., d:],
                out3[..., d:],
                out5[..., d:],
                out7[..., d:],
            ],
            axis=-1,
        )


def tree5_out_planes(out_planes: int, dense_depth: int) -> int:
    """Tree output width = its root block's width (root=True)."""
    return out_planes + 4 * dense_depth


class Tree5(nn.Module):
    """generator_5.py:92-156 — channel chain computed exactly as upstream."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        return tree5_out_planes(self.out_planes, self.dense_depth)

    @nn.compact
    def __call__(self, x):
        ip, op, dd = self.in_planes, self.out_planes, self.dense_depth
        d = op

        def block(last, root, unify, name):
            return BasicBlock5(last, ip, op, dd, root=root, is_unify=unify,
                               dtype=self.dtype, name=name)

        last = self.last_planes
        xs = []
        if self.level > 1:
            pr = block(last, False, last < op, "prev_root")
            xs.append(pr(x))
            for i in reversed(range(1, self.level)):
                sub = Tree5(last, ip, op, dd, level=i, block_num=self.block_num,
                            dtype=self.dtype, name=f"level_{i}")
                x = sub(x)
                last = sub.get_out_planes()
                xs.append(x)
            for i in range(self.block_num):
                b = block(last, False, False, f"block_{i}")
                x = b(x)
                last = b.get_out_planes()
                xs.append(x[..., :d])
        else:
            b0 = block(last, False, last < op, "block_0")
            x = b0(x)
            last = b0.get_out_planes()
            xs.append(x[..., :d])
            for i in range(1, self.block_num):
                b = block(last, False, False, f"block_{i}")
                x = b(x)
                last = b.get_out_planes()
                xs.append(x[..., :d])
        xs.append(x[..., d:])
        cat = jnp.concatenate(xs, axis=-1)
        root = BasicBlock5(cat.shape[-1], ip * self.block_num, op, dd,
                           root=True, is_unify=False, dtype=self.dtype,
                           name="root")
        return root(cat)


class StemBlock5(nn.Module):
    """generator_5.py:158-220."""

    in_planes: int
    planes: int
    block_num: int = 3
    kernel_size: int = 3
    expansion: int = 1
    dtype: jnp.dtype = None

    def _conv_group(self, x, in_planes, train):
        e = in_planes * self.expansion
        x = core.Conv(e, 1, 1, 0, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(e, self.kernel_size, 1, (self.kernel_size - 1) // 2,
                      groups=e, pad_mode="reflect", dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(self.planes, 1, 1, 0, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return x

    def _se(self, out):
        g = core.Conv(self.planes, 1, dtype=self.dtype)(out)
        g = core.leaky_relu(g, 0.2)
        g = core.Conv(self.planes, 1, dtype=self.dtype)(g)
        return nn.sigmoid(g)

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = self._conv_group(x, self.in_planes, train)
        out = out * self._se(out)
        if self.in_planes != self.planes:
            sc = core.Conv(self.planes, 1, 1, 0, dtype=self.dtype)(x)
            sc = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(sc)
        else:
            sc = x
        x = sc + out
        for _ in range(1, self.block_num):
            out = self._conv_group(x, self.planes, train)
            out = out * self._se(out)
            x = x + out
        x = core.ConvTranspose(self.planes, 4, 2, 1, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return core.leaky_relu(x, 0.2)


class Generator5(nn.Module):
    """generator_5.py:222-267."""

    z_dim: int = 256
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        f = 512
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(f, 4, 2, 1, dtype=self.dtype)(x)  # 2x2
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = StemBlock5(f, f // 2, 3, 3, dtype=self.dtype)(x, train)      # 4x4
        x = StemBlock5(f // 2, f // 2, 4, 3, dtype=self.dtype)(x, train)  # 8x8
        last = f // 2

        stages = [
            # (in_planes, out_planes, dense_depth, level, block_num)
            (64, 128, 16, 3, 6),   # 8x8
            (32, 64, 12, 3, 6),    # 16x16
            (16, 32, 8, 2, 5),     # 32x32
        ]
        for ip, op, dd, lvl, bn in stages:
            t = Tree5(last, ip, op, dd, level=lvl, block_num=bn, dtype=self.dtype)
            x = t(x)
            last = t.get_out_planes()
            x = core.ConvTranspose(last, 4, 2, 1, dtype=self.dtype)(x)
            x = core.InstanceNorm(dtype=self.dtype)(x)
            x = core.leaky_relu(x, 0.2)
        t4 = Tree5(last, 8, 16, 4, level=2, block_num=4, dtype=self.dtype)  # 64x64
        x = t4(x)
        last = t4.get_out_planes()
        x = core.Conv(3, 9, 1, 4, pad_mode="reflect", dtype=self.dtype)(x)
        return jnp.tanh(x)
