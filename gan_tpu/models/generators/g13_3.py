"""G13_3 / G13_4 — style machinery removed: pure EqualizedConv + BatchNorm
SK trees.

References:
- /root/reference/generators/generator_13_3.py (planes=32, all trees
  level/block 1, per-channel residual scale ~ U(0.25, 0.35))
- generator_13_4.py = 13_3 with planes=64, deeper trees
  (start (1,2), blocks (1,2)x2 then (2,2)x2), SK-attention residual fusion
  instead of the scalar scale, and deeper SK fc stacks (V13_4).

Both use SK/SE stacks with a trailing BatchNorm1d in fc_sub (V13_3/V13_4
in gan_tpu.models.sk).
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk


class SKConvPlain(nn.Module):
    """generator_13_3.py:175-204 (same as 13_5's non-style SKConv)."""

    features: int
    m: int
    image_size: int
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        feas = []
        for i in range(self.m):
            f = sk.EqualizedConvRep(self.features, 3 + 2 * i,
                                    dtype=self.dtype, name=f"conv_{i}")(x)
            f = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name=f"BatchNorm_{i}")(f)
            f = core.PReLU(channels=self.features, dtype=self.dtype,
                           name=f"nonlinear_{i}")(f)
            feas.append(f)
        feas = jnp.stack(feas, axis=1)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        att = att_cls(self.m, style=self.style, dtype=self.dtype,
                      name="sk_attention")(feas, train)
        return sk.sk_fuse(feas, att)


class PlainBlock(nn.Module):
    """13_3 'StyleBlock' (no style, generator_13_3.py:207-233): conv1 k1 +
    BN + PReLU, then either conv2 kxk + BN + PReLU or SKConv to out+dd."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    image_size: int
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        x = sk.EqualizedConvRep(ip, 1, dtype=self.dtype, name="conv1")(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn1")(x)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        if self.m == 1:
            x = sk.EqualizedConvRep(od, self.kernel_size, dtype=self.dtype,
                                    name="conv2")(x)
            x = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="bn2")(x)
            x = core.PReLU(channels=od, dtype=self.dtype, name="activation2")(x)
        else:
            x = SKConvPlain(od, self.m, self.image_size, style=self.style,
                            dtype=self.dtype, name="skconv")(x, train)
        return x


class ResnetInit133(nn.Module):
    """generator_13_3.py:236-265: RiR with SK-attention stream fusion."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    image_size: int
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    fused: bool = True

    @nn.compact
    def __call__(self, xs, train: bool = True):
        x_res, x_tra = xs
        kw = dict(in_planes=self.in_planes, out_planes=self.out_planes,
                  kernel_size=self.kernel_size, m=self.m,
                  image_size=self.image_size, style=self.style,
                  dtype=self.dtype)
        if self.fused:
            VBlock = nn.vmap(
                PlainBlock,
                in_axes=(0, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )
            pair = jnp.stack([x_res, x_tra])
            ga = VBlock(dense_depth=self.dense_depth, name="group_dd", **kw)(pair, train)
            gb = VBlock(dense_depth=0, name="group_nodd", **kw)(pair, train)
            r_r, t_r = ga[0], ga[1]
            r_t, t_t = gb[0], gb[1]
        else:
            r_r = PlainBlock(dense_depth=self.dense_depth, name="residual", **kw)(x_res, train)
            r_t = PlainBlock(dense_depth=0, name="residual_across", **kw)(x_res, train)
            t_t = PlainBlock(dense_depth=0, name="transient", **kw)(x_tra, train)
            t_r = PlainBlock(dense_depth=self.dense_depth, name="transient_across", **kw)(x_tra, train)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        feas_res = jnp.stack([r_r, t_r], axis=1)
        feas_tra = jnp.stack([r_t, t_t], axis=1)
        a_res = att_cls(2, style=self.style, dtype=self.dtype,
                        name="sk_attention_residual")(feas_res, train)
        a_tra = att_cls(2, style=self.style, dtype=self.dtype,
                        name="sk_attention_transient")(feas_tra, train)
        return sk.sk_fuse(feas_res, a_res), sk.sk_fuse(feas_tra, a_tra)


class SelfAttention133(nn.Module):
    """generator_13_3.py:323-351: equalized 3x3 projections, SE-gated gamma."""

    image_size: int
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, wd, c = x.shape
        n = h * wd
        f = sk.EqualizedConvRep(c, 3, dtype=self.dtype, name="query")(x).reshape(b, n, c)
        g = sk.EqualizedConvRep(c, 3, dtype=self.dtype, name="key")(x).reshape(b, n, c)
        hx = sk.EqualizedConvRep(c, 3, dtype=self.dtype, name="value")(x).reshape(b, n, c)
        from gan_tpu.ops import attention_core

        v = attention_core(f, g, hx).reshape(b, h, wd, c)
        o = sk.EqualizedConvRep(c, 3, dtype=self.dtype, name="self_att")(v)
        se_cls = sk.SEBlockConv if self.image_size > 4 else sk.SEBlockFC
        gamma = se_cls(style=self.style, dtype=self.dtype, name="gamma")(o, train)
        return gamma * o + x


class BasicBlock133(nn.Module):
    """generator_13_3.py:353-410 (scale residual) /
    generator_13_4.py (SK-attention residual fusion, no scale)."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    m: int
    image_size: int
    root: bool = False
    is_unify: bool = False
    sk_residual: bool = False  # True = 13_4 fusion
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        if self.is_unify or self.root:
            return 2 * self.out_planes + 2 * self.dense_depth
        return self.last_planes + self.dense_depth

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.out_planes
        dd = self.dense_depth
        if not self.sk_residual:
            scale = self.param("scale", core.uniform_init(0.25, 0.35), (d,))
        if self.is_unify:
            x = sk.EqualizedConvRep(2 * d + dd, 1, dtype=self.dtype,
                                    name="unify")(x)
            x = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="bn_unify")(x)
        x_res = jnp.concatenate([x[..., :d], x[..., 2 * d:]], axis=-1)
        x_tra = x[..., d:]
        r3, t3 = ResnetInit133(self.in_planes, d, dd, 3, self.m,
                               self.image_size, style=self.style,
                               dtype=self.dtype, name="rir_3")((x_res, x_tra), train)
        if self.root:
            x = sk.EqualizedConvRep(2 * d + dd, 1, dtype=self.dtype,
                                    name="shortcut")(x)
            x = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="bn_shortcut")(x)
        if self.sk_residual:
            att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
            feas = jnp.stack([x[..., :d], r3[..., :d]], axis=1)
            a = att_cls(2, style=self.style, dtype=self.dtype,
                        name="sk_attention_residual")(feas, train)
            res = sk.sk_fuse(feas, a)
        else:
            res = x[..., :d] + r3[..., :d] * scale.astype(x.dtype)
        att_r = SelfAttention133(self.image_size, style=self.style,
                                 dtype=self.dtype, name="attention_residual")(
            jnp.concatenate([res, r3[..., d:]], axis=-1), train)
        att_t = SelfAttention133(self.image_size, style=self.style,
                                 dtype=self.dtype,
                                 name="attention_transient")(t3, train)
        return jnp.concatenate(
            [att_r[..., :d], att_t, x[..., 2 * d:], att_r[..., d:]], axis=-1
        )


class ToRGB133(nn.Module):
    """generator_13_3.py:412-436: pre conv/SKConv, EqConv k1 to 3, BN,
    PReLU(3)."""

    m: int
    image_size: int
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        planes = x.shape[-1]
        if self.m == 1:
            x = sk.EqualizedConvRep(planes, 3, dtype=self.dtype,
                                    name="pre_conv")(x)
            x = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="pre_bn")(x)
            x = core.PReLU(channels=planes, dtype=self.dtype,
                           name="pre_activation")(x)
        else:
            x = SKConvPlain(planes, self.m, self.image_size,
                            style=self.style, dtype=self.dtype,
                            name="skconv")(x, train)
        x = sk.EqualizedConvRep(3, 1, dtype=self.dtype, name="conv")(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="bn")(x)
        return core.PReLU(channels=3, dtype=self.dtype, name="activation")(x)


class Tree133(nn.Module):
    """generator_13_3.py:439-514: SK rgb fusion."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    m: int
    image_size: int
    sk_residual: bool = False
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    def _block(self, last, root, unify, name):
        ip = self.in_planes * self.block_num if root else self.in_planes
        return BasicBlock133(last, ip, self.out_planes, self.dense_depth,
                             self.m, self.image_size, root=root,
                             is_unify=unify, sk_residual=self.sk_residual,
                             style=self.style, dtype=self.dtype, name=name)

    def get_out_planes(self) -> int:
        return 2 * self.out_planes + 2 * self.dense_depth

    @nn.compact
    def __call__(self, x, rgb, train: bool = True):
        d = self.out_planes
        last = self.last_planes
        xs = []
        if self.level > 1:
            pr = self._block(last, False, last < 2 * d, "prev_root")
            xs.append(pr(x, train))
            for i in reversed(range(1, self.level)):
                sub = Tree133(last, self.in_planes, self.out_planes,
                              self.dense_depth, level=i,
                              block_num=self.block_num, m=self.m,
                              image_size=self.image_size,
                              sk_residual=self.sk_residual, style=self.style,
                              dtype=self.dtype, name=f"level_{i}")
                x, rgb = sub(x, rgb, train)
                last = sub.get_out_planes()
                xs.append(x)
            for i in range(self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        else:
            b0 = self._block(last, False, last < 2 * d, "block_0")
            x = b0(x, train)
            last = b0.get_out_planes()
            xs.append(x[..., : 2 * d])
            for i in range(1, self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        xs.append(x[..., 2 * d:])
        cat = jnp.concatenate(xs, axis=-1)
        out = self._block(cat.shape[-1], True, False, "root")(cat, train)
        rgb_new = ToRGB133(self.m, self.image_size, style=self.style,
                           dtype=self.dtype, name="to_rgb")(out, train)
        feas = jnp.stack([rgb, rgb_new], axis=1)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        att = att_cls(2, style=self.style, dtype=self.dtype,
                      name="sk_attention")(feas, train)
        return out, sk.sk_fuse(feas, att)


class _SkTreeGenerator(nn.Module):
    """Shared 13_3/13_4 skeleton (generator_13_3.py:516-578)."""

    z_dim: int = 256
    planes: int = 32
    tree_shapes: Sequence[Tuple[int, int]] = ((1, 1),) * 5  # start + 4 blocks
    sk_residual: bool = False
    style: sk.SKStyle = sk.V13_3
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(p * 8, 4, 1, 0, dtype=self.dtype,
                               name="start_convT")(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="start_bn")(x)
        x = core.PReLU(channels=p * 8, dtype=self.dtype,
                       name="start_activation")(x)
        rgb = ToRGB133(1, 4, style=self.style, dtype=self.dtype,
                       name="start_to_rgb")(x, train)
        lvl, bn = self.tree_shapes[0]
        start_tree = Tree133(p * 8, p * 8, p * 4, p // 8, level=lvl,
                             block_num=bn, m=1, image_size=4,
                             sk_residual=self.sk_residual, style=self.style,
                             dtype=self.dtype, name="start_tree")
        x, rgb = start_tree(x, rgb, train)
        last = start_tree.get_out_planes()

        stages = [
            (p * 4, p * 4, 8),
            (p * 2, p * 2, 16),
            (p * 1, p * 1, 32),
            (p * 1, p * 1, 64),
        ]
        for i, (ip, op, size) in enumerate(stages):
            lvl, bn = self.tree_shapes[i + 1]
            rgb = sk.SKConvT(style=self.style, dtype=self.dtype,
                             name=f"block{i + 1}_upsample_rgb")(rgb, train)
            x = sk.SKConvT(style=self.style, dtype=self.dtype,
                           name=f"block{i + 1}_upsample")(x, train)
            t = Tree133(last, ip, op, p // 8, level=lvl, block_num=bn, m=2,
                        image_size=size, sk_residual=self.sk_residual,
                        style=self.style, dtype=self.dtype,
                        name=f"block{i + 1}_tree")
            x, rgb = t(x, rgb, train)
            last = t.get_out_planes()
        return rgb


def Generator13_3(z_dim: int = 256, dtype=None):
    return _SkTreeGenerator(z_dim=z_dim, planes=32,
                            tree_shapes=((1, 1),) * 5, sk_residual=False,
                            style=sk.V13_3, dtype=dtype)


def Generator13_4(z_dim: int = 256, dtype=None):
    return _SkTreeGenerator(
        z_dim=z_dim, planes=64,
        tree_shapes=((1, 2), (1, 2), (1, 2), (2, 2), (2, 2)),
        sk_residual=True, style=sk.V13_4, dtype=dtype,
    )
