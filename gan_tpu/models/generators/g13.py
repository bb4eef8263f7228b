"""G13 (and its byte-identical alias G13_2) — selective-kernel style
generator.

Reference: /root/reference/generators/generator_13.py:572-593 (Generator,
planes=56); SKConvT upsampling for features and rgb (:150-167), SK-fused
RiR (:345-375), per-block residual scale ~ U(0.25,0.35) with dual
SelfAttentions (:378-427), style-conditioned ToRGB with SK rgb fusion in
trees (:430-527), GeneratorStart with 8-layer mapping (:550-569).
generator_13_2.py is a byte-identical copy (SURVEY Appendix A.12) —
registered as an alias.
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk


class SKStyleConv13(nn.Module):
    """G13 SKConv (generator_13.py:218-241): m StyleConvs with kernel
    3+2i, PReLU each, SK-conv-attention fusion."""

    features: int
    m: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        feas = []
        for i in range(self.m):
            f = sk.StyleConv13(self.features, 3 + 2 * i, dtype=self.dtype,
                               name=f"conv_{i}")(x, w, train)
            f = core.PReLU(channels=self.features, dtype=self.dtype,
                           name=f"nonlinear_{i}")(f)
            feas.append(f)
        feas = jnp.stack(feas, axis=1)
        att = sk.SKAttentionConv(self.m, dtype=self.dtype,
                                 name="sk_attention")(feas, train)
        return sk.sk_fuse(feas, att)


class StyleBlock13(nn.Module):
    """generator_13.py:244-270."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        x = sk.StyleConv13(ip, 1, dtype=self.dtype, name="conv1")(x, w, train)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        if self.m == 1:
            x = sk.StyleConv13(ip, self.kernel_size, dtype=self.dtype,
                               name="conv2")(x, w, train)
            x = core.PReLU(channels=ip, dtype=self.dtype, name="activation2")(x)
        else:
            x = SKStyleConv13(ip, self.m, dtype=self.dtype, name="skconv")(x, w, train)
        x = sk.StyleConv13(od, self.kernel_size, dtype=self.dtype,
                           name="conv3")(x, w, train)
        return core.PReLU(channels=od, dtype=self.dtype, name="activation3")(x)


class SelfAttention13(nn.Module):
    """generator_13.py:315-343: 3x3 equalized-conv projections; gate
    gamma = SEBlock(o); y = gamma(o) * o + x; softmax-dim=1 quirk kept."""

    image_size: int
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
        if self.image_size > 4:
            gamma = sk.SEBlockConv(dtype=self.dtype, name="gamma")(o, train)
        else:
            gamma = sk.SEBlockFC(dtype=self.dtype, name="gamma")(o, train)
        return gamma * o + x


class ResnetInit13(nn.Module):
    """generator_13.py:345-375: RiR cross-wiring with SK-attention stream
    fusion."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    image_size: int
    dtype: jnp.dtype = None

    fused: bool = True

    @nn.compact
    def __call__(self, xs, w, train: bool = True):
        x_res, x_tra = xs
        kw = dict(in_planes=self.in_planes, out_planes=self.out_planes,
                  kernel_size=self.kernel_size, m=self.m, dtype=self.dtype)
        if self.fused:
            VBlock = nn.vmap(
                StyleBlock13,
                in_axes=(0, None, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "noise": True},
            )
            pair = jnp.stack([x_res, x_tra])
            ga = VBlock(dense_depth=self.dense_depth, name="group_dd", **kw)(pair, w, train)
            gb = VBlock(dense_depth=0, name="group_nodd", **kw)(pair, w, train)
            r_r, t_r = ga[0], ga[1]
            r_t, t_t = gb[0], gb[1]
        else:
            r_r = StyleBlock13(dense_depth=self.dense_depth, name="residual", **kw)(x_res, w, train)
            r_t = StyleBlock13(dense_depth=0, name="residual_across", **kw)(x_res, w, train)
            t_t = StyleBlock13(dense_depth=0, name="transient", **kw)(x_tra, w, train)
            t_r = StyleBlock13(dense_depth=self.dense_depth, name="transient_across", **kw)(x_tra, w, train)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        feas_res = jnp.stack([r_r, t_r], axis=1)
        feas_tra = jnp.stack([r_t, t_t], axis=1)
        a_res = att_cls(2, dtype=self.dtype, name="sk_attention_residual")(feas_res, train)
        a_tra = att_cls(2, dtype=self.dtype, name="sk_attention_transient")(feas_tra, train)
        return sk.sk_fuse(feas_res, a_res), sk.sk_fuse(feas_tra, a_tra)


class BasicBlock13(nn.Module):
    """generator_13.py:378-427. Channel math: unify/root -> 2*out + 2*dd,
    else last + dd."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    m: int
    image_size: int
    root: bool = False
    is_unify: bool = False
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        if self.is_unify or self.root:
            return 2 * self.out_planes + 2 * self.dense_depth
        return self.last_planes + self.dense_depth

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        d = self.out_planes
        dd = self.dense_depth
        scale = self.param("scale", core.uniform_init(0.25, 0.35), (d,))
        if self.is_unify:
            x = sk.StyleConv13(2 * d + dd, 1, dtype=self.dtype,
                               name="unify")(x, w, train)
        x_res = jnp.concatenate([x[..., :d], x[..., 2 * d:]], axis=-1)
        x_tra = x[..., d:]
        r3, t3 = ResnetInit13(self.in_planes, d, dd, 3, self.m,
                              self.image_size, dtype=self.dtype,
                              name="rir_3")((x_res, x_tra), w, train)
        if self.root:
            x = sk.StyleConv13(2 * d + dd, 1, dtype=self.dtype,
                               name="shortcut")(x, w, train)
        res = x[..., :d] + r3[..., :d] * scale.astype(x.dtype)
        att_r = SelfAttention13(self.image_size, dtype=self.dtype,
                                name="attention_residual")(
            jnp.concatenate([res, r3[..., d:]], axis=-1), train)
        att_t = SelfAttention13(self.image_size, dtype=self.dtype,
                                name="attention_transient")(t3, train)
        return jnp.concatenate(
            [att_r[..., :d], att_t, x[..., 2 * d:], att_r[..., d:]], axis=-1
        )


class ToRGB13(nn.Module):
    """generator_13.py:430-452: style pre-conv (or SKConv), un-demodulated
    1x1 modulated conv to 3 + bias + PReLU(3)."""

    m: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        planes = x.shape[-1]
        if self.m == 1:
            x = sk.StyleConv13(planes, 3, dtype=self.dtype,
                               name="pre_conv")(x, w, train)
            x = core.PReLU(channels=planes, dtype=self.dtype,
                           name="pre_activation")(x)
        else:
            x = SKStyleConv13(planes, self.m, dtype=self.dtype,
                              name="skconv")(x, w, train)
        x = sk.ModulatedConv13(3, 1, demodulate=False, dtype=self.dtype,
                               name="conv")(x, w, train)
        bias = self.param("bias", core.normal_init(1.0), (3,))
        x = x + bias.astype(x.dtype)
        return core.PReLU(channels=3, dtype=self.dtype, name="activation")(x)


class Tree13(nn.Module):
    """generator_13.py:455-527: rgb threaded through subtrees; new rgb via
    to_rgb; fused with the incoming rgb by a 3-channel 2-way SK attention."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    m: int
    image_size: int
    dtype: jnp.dtype = None

    def _block(self, last, root, unify, name):
        ip = self.in_planes * self.block_num if root else self.in_planes
        return BasicBlock13(last, ip, self.out_planes, self.dense_depth,
                            self.m, self.image_size, root=root,
                            is_unify=unify, dtype=self.dtype, name=name)

    def get_out_planes(self) -> int:
        return 2 * self.out_planes + 2 * self.dense_depth

    @nn.compact
    def __call__(self, x, w, rgb, train: bool = True):
        d = self.out_planes
        last = self.last_planes
        xs = []
        if self.level > 1:
            pr = self._block(last, False, last < 2 * d, "prev_root")
            xs.append(pr(x, w, train))
            for i in reversed(range(1, self.level)):
                sub = Tree13(last, self.in_planes, self.out_planes,
                             self.dense_depth, level=i,
                             block_num=self.block_num, m=self.m,
                             image_size=self.image_size, dtype=self.dtype,
                             name=f"level_{i}")
                x, rgb = sub(x, w, rgb, train)
                last = sub.get_out_planes()
                xs.append(x)
            for i in range(self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, w, train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        else:
            b0 = self._block(last, False, last < 2 * d, "block_0")
            x = b0(x, w, train)
            last = b0.get_out_planes()
            xs.append(x[..., : 2 * d])
            for i in range(1, self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, w, train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        xs.append(x[..., 2 * d:])
        cat = jnp.concatenate(xs, axis=-1)
        out = self._block(cat.shape[-1], True, False, "root")(cat, w, train)
        rgb_new = ToRGB13(self.m, dtype=self.dtype, name="to_rgb")(out, w, train)
        feas = jnp.stack([rgb, rgb_new], axis=1)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        att = att_cls(2, dtype=self.dtype, name="sk_attention")(feas, train)
        rgb = sk.sk_fuse(feas, att)
        return out, rgb


class GeneratorBlock13(nn.Module):
    """generator_13.py:530-547: SK upsample of rgb and features, then tree."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    m: int
    image_size: int
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        return 2 * self.out_planes + 2 * self.dense_depth

    @nn.compact
    def __call__(self, x, w, rgb, train: bool = True):
        rgb = sk.SKConvT(dtype=self.dtype, name="upsample_rgb")(rgb, train)
        x = sk.SKConvT(dtype=self.dtype, name="upsample")(x, train)
        return Tree13(self.last_planes, self.in_planes, self.out_planes,
                      self.dense_depth, self.level, self.block_num, self.m,
                      self.image_size, dtype=self.dtype,
                      name="tree")(x, w, rgb, train)


class Generator13(nn.Module):
    """generator_13.py:572-593 (planes=56, mapping 8 layers, m=1 start then
    m=2 blocks at 8/16/32/64)."""

    z_dim: int = 256
    planes: int = 56
    mapping_layers: int = 8
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        w = sk.Mapping13(self.mapping_layers, dtype=self.dtype,
                         name="mapping_network")(z, train)
        # GeneratorStart (generator_13.py:550-569)
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(p * 8, 4, 1, 0, dtype=self.dtype,
                               name="start_convT")(x)
        x = core.PReLU(channels=p * 8, dtype=self.dtype,
                       name="start_activation")(x)
        rgb = ToRGB13(1, dtype=self.dtype, name="start_to_rgb")(x, w, train)
        start_tree = Tree13(p * 8, p * 8, p * 4, p // 8, level=1, block_num=2,
                            m=1, image_size=4, dtype=self.dtype,
                            name="start_tree")
        x, rgb = start_tree(x, w, rgb, train)
        last = start_tree.get_out_planes()

        stages = [
            (p * 4, p * 4, 8),
            (p * 2, p * 2, 16),
            (p * 1, p * 1, 32),
            (p * 1, p * 1, 64),
        ]
        for i, (ip, op, size) in enumerate(stages):
            blk = GeneratorBlock13(last, ip, op, p // 8, level=2, block_num=2,
                                   m=2, image_size=size, dtype=self.dtype,
                                   name=f"block{i + 1}")
            x, rgb = blk(x, w, rgb, train)
            last = blk.get_out_planes()
        return rgb
