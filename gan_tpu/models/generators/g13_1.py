"""G13_1 — earlier style variant between G12 and G13.

Reference: /root/reference/generators/generator_13_1.py (diff base:
generator_12.py). Key deltas vs G12:
- MappingNetwork without z-normalization; EqualizedLinear bias ~ N(0,1)
- Conv2dWeightModulate carries its own to_style (Mapping(2) + EqLinear);
  StyleConv = modulated conv + bias only (no noise) — i.e. sk.StyleConv13
  with bn=False
- SelfAttention gamma per-channel ~ U(0.7, 0.8)
- StyleBlock: conv1 -> act -> SelfAttention -> conv2 -> act -> conv3 (no
  final activation)
- ResnetInit: additive fusion + PReLU activations
- BasicBlock: no attention; per-channel residual scale ~ U(0.3, 0.4)
- Tree: per-subtree mix ToRGB modules (mix_%d), rgb REPLACED (not added);
  final get_rgb mixes (rgb, to_rgb(root))
- UpSample: ConvT + PReLU(out) + Smooth, bicubic skip with optional
  StyleConv unify and StyleConv k3 mix (:347-385)
- Generator: planes=64, no initial constant, 4 GeneratorBlocks level=2 bn=2
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk


def _style_conv(features, kernel_size, dtype=None, name=None):
    """13_1 StyleConv == sk.StyleConv13 (bn=False, no noise, live bias)."""
    return sk.StyleConv13(features, kernel_size, use_noise=False, bn=False,
                          dead_bias=False, dtype=dtype, name=name)


class SelfAttention131(nn.Module):
    """generator_13_1.py SelfAttention: StyleConv projections, gamma
    per-channel ~ U(0.7, 0.8)."""

    embedding_channels: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        b, h, wd, c = x.shape
        n = h * wd
        e = self.embedding_channels
        f = _style_conv(e, 1, self.dtype, "key")(x, w, train).reshape(b, n, e)
        g = _style_conv(e, 1, self.dtype, "query")(x, w, train).reshape(b, n, e)
        hx = _style_conv(e, 1, self.dtype, "value")(x, w, train).reshape(b, n, e)
        from gan_tpu.ops import attention_core

        v = attention_core(f, g, hx).reshape(b, h, wd, e)
        o = _style_conv(c, 1, self.dtype, "self_att")(v, w, train)
        gamma = self.param("gamma", core.uniform_init(0.7, 0.8), (c,))
        return gamma.astype(x.dtype) * o + x


class StyleBlock131(nn.Module):
    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        k = self.kernel_size
        x = _style_conv(ip, 1, self.dtype, "conv1")(x, w, train)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        x = SelfAttention131(ip, dtype=self.dtype, name="attention1")(x, w, train)
        x = _style_conv(ip, k, self.dtype, "conv2")(x, w, train)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation2")(x)
        x = _style_conv(od, k, self.dtype, "conv3")(x, w, train)
        return x


class SEBlock131(nn.Module):
    """G12's SEBlock with 13_1 StyleConvs (global pool + 2 x StyleConv)."""

    in_planes: int
    out_planes: int
    dense_depth: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        x = core.global_avg_pool(x)
        x = _style_conv(ip, 1, self.dtype, "conv1")(x, w, train)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        x = _style_conv(od, 1, self.dtype, "conv2")(x, w, train)
        return nn.sigmoid(x)


class SEStyleBlock131(nn.Module):
    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        x = StyleBlock131(self.in_planes, self.out_planes, self.dense_depth,
                          self.kernel_size, dtype=self.dtype, name="convs")(x, w, train)
        se = SEBlock131(self.in_planes, self.out_planes, self.dense_depth,
                        dtype=self.dtype, name="se")(x, w, train)
        return x * se


class ResnetInit131(nn.Module):
    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    fused: bool = True

    @nn.compact
    def __call__(self, xs, w, train: bool = True):
        x_res, x_tra = xs
        kw = dict(in_planes=self.in_planes, out_planes=self.out_planes,
                  kernel_size=self.kernel_size, dtype=self.dtype)
        if self.fused:
            VBlock = nn.vmap(
                SEStyleBlock131,
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
            r_r = SEStyleBlock131(dense_depth=self.dense_depth, name="residual", **kw)(x_res, w, train)
            r_t = SEStyleBlock131(dense_depth=0, name="residual_across", **kw)(x_res, w, train)
            t_t = SEStyleBlock131(dense_depth=0, name="transient", **kw)(x_tra, w, train)
            t_r = SEStyleBlock131(dense_depth=self.dense_depth, name="transient_across", **kw)(x_tra, w, train)
        od = self.out_planes + self.dense_depth
        res = core.PReLU(channels=od, dtype=self.dtype,
                         name="activation_residual")(r_r + t_r)
        tra = core.PReLU(channels=self.out_planes, dtype=self.dtype,
                         name="activation_transient")(r_t + t_t)
        return res, tra


class ToRGB131(nn.Module):
    """attention + modulated 1x1 (own to_style) + bias + PReLU(3)."""

    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        planes = x.shape[-1]
        x = SelfAttention131(planes, dtype=self.dtype, name="attention")(x, w, train)
        x = sk.ModulatedConv13(3, 1, demodulate=False, bn=False,
                               dtype=self.dtype, name="conv")(x, w, train)
        bias = self.param("bias", core.normal_init(1.0), (3,))
        x = x + bias.astype(x.dtype)
        return core.PReLU(channels=3, dtype=self.dtype, name="activation")(x)


class BasicBlock131(nn.Module):
    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
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
        scale = self.param("scale", core.uniform_init(0.3, 0.4), (d,))
        if self.is_unify:
            x = _style_conv(2 * d + dd, 1, self.dtype, "unify")(x, w, train)
        x_res = jnp.concatenate([x[..., :d], x[..., 2 * d:]], axis=-1)
        x_tra = x[..., d:]
        r3, t3 = ResnetInit131(self.in_planes, d, dd, 3, dtype=self.dtype,
                               name="rir_3")((x_res, x_tra), w, train)
        if self.root:
            x = _style_conv(2 * d + dd, 1, self.dtype, "shortcut")(x, w, train)
        res = x[..., :d] + r3[..., :d] * scale.astype(x.dtype)
        return jnp.concatenate(
            [res, t3, x[..., 2 * d:], r3[..., d:]], axis=-1
        )


class Tree131(nn.Module):
    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    dtype: jnp.dtype = None

    def _block(self, last, root, unify, name):
        ip = self.in_planes * self.block_num if root else self.in_planes
        return BasicBlock131(last, ip, self.out_planes, self.dense_depth,
                             root=root, is_unify=unify, dtype=self.dtype,
                             name=name)

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
                sub = Tree131(last, self.in_planes, self.out_planes,
                              self.dense_depth, level=i,
                              block_num=self.block_num, dtype=self.dtype,
                              name=f"level_{i}")
                x, rgb_new = sub(x, w, rgb, train)
                rgb = ToRGB131(dtype=self.dtype, name=f"mix_{i}")(
                    jnp.concatenate([rgb, rgb_new], axis=-1), w, train)
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
        rgb_new = ToRGB131(dtype=self.dtype, name="to_rgb")(out, w, train)
        rgb = ToRGB131(dtype=self.dtype, name="get_rgb")(
            jnp.concatenate([rgb, rgb_new], axis=-1), w, train)
        return out, rgb


class UpSample131(nn.Module):
    """generator_13_1.py:347-385."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_attention: bool = True
    use_bic: bool = True
    use_smooth: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        planes = x.shape[-1]
        if self.use_attention:
            x = SelfAttention131(planes, dtype=self.dtype,
                                 name="attention")(x, w, train)
        out = core.ConvTranspose(self.features, self.kernel_size, self.stride,
                                 self.padding, dtype=self.dtype)(x)
        out = core.PReLU(channels=self.features, dtype=self.dtype,
                         name="activation_convT")(out)
        if self.use_smooth:
            out = core.smooth(out)
        if self.use_bic:
            xb = core.resize_bicubic(x, (x.shape[1] * 2, x.shape[2] * 2))
            if self.use_smooth:
                xb = core.smooth(xb)
            if planes != self.features:
                xb = _style_conv(self.features, 1, self.dtype, "unify")(xb, w, train)
            out = _style_conv(self.features, 3, self.dtype, "mix")(
                jnp.concatenate([xb, out], axis=-1), w, train)
            out = core.PReLU(channels=self.features, dtype=self.dtype,
                             name="activation_mix")(out)
        return out


class GeneratorBlock131(nn.Module):
    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        return 2 * self.out_planes + 2 * self.dense_depth

    @nn.compact
    def __call__(self, x, w, rgb, train: bool = True):
        rgb = core.upsample_smooth(rgb)
        x = UpSample131(self.last_planes, dtype=self.dtype,
                        name="upsample")(x, w, train)
        x, rgb_new = Tree131(self.last_planes, self.in_planes,
                             self.out_planes, self.dense_depth, self.level,
                             self.block_num, dtype=self.dtype,
                             name="tree")(x, w, rgb, train)
        rgb = ToRGB131(dtype=self.dtype, name="get_rgb")(
            jnp.concatenate([rgb, rgb_new], axis=-1), w, train)
        return x, rgb


class Generator13_1(nn.Module):
    """generator_13_1.py:409-458 (planes=64, mapping 8 layers)."""

    z_dim: int = 256
    planes: int = 64
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        w = sk.Mapping13(8, bn=False, dtype=self.dtype,
                         name="mapping_network")(z, train)
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = UpSample131(p * 8, 4, 1, 0, use_attention=False, use_bic=False,
                        use_smooth=False, dtype=self.dtype,
                        name="upsample1")(x, w, train)
        x = SEStyleBlock131(p * 8, p * 8, 0, 3, dtype=self.dtype,
                            name="style1")(x, w, train)
        x = core.PReLU(channels=p * 8, dtype=self.dtype, name="activation1")(x)
        rgb = ToRGB131(dtype=self.dtype, name="to_rgb1")(x, w, train)

        last = p * 8
        stages = [(p * 4, p * 4), (p * 2, p * 2), (p * 1, p * 1), (p * 1, p * 1)]
        for i, (ip, op) in enumerate(stages):
            blk = GeneratorBlock131(last, ip, op, p // 8, level=2,
                                    block_num=2, dtype=self.dtype,
                                    name=f"block{i + 1}")
            x, rgb = blk(x, w, rgb, train)
            last = blk.get_out_planes()
        return rgb
