"""G12 — first StyleGAN2-style rewrite of the DPN/RiR/DLA generator.

Reference: /root/reference/generators/generator_12.py:384-442.
8-layer mapping network; learned 4x4 initial constant added to an upsampled
z; style-conditioned blocks throughout (every conv is a StyleConv with its
own 2-layer to_style mapping); ToRGB skip accumulation with learned 6->3
mixing (`rgb + mix_rgb(cat(rgb, rgb_new))`), bicubic+Smooth rgb upsampling;
single-branch RiR trees (level 1, block_num 2) with in-block attention.
Output = Tanh(rgb) — NOT tanh of features (SURVEY Appendix A.3 family).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models.style import (
    Conv2dWeightModulate,
    MappingNetwork,
    StyleConv,
    StyleSelfAttention,
    ToRGB,
)


class StyleBlock(nn.Module):
    """generator_12.py:189-206: three StyleConvs (1x1, kxk, kxk) with
    per-channel PReLUs."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        k = self.kernel_size
        x = StyleConv(ip, 1, dtype=self.dtype, name="conv1")(x, w)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        x = StyleConv(ip, k, dtype=self.dtype, name="conv2")(x, w)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation2")(x)
        x = StyleConv(od, k, dtype=self.dtype, name="conv3")(x, w)
        return core.PReLU(channels=od, dtype=self.dtype, name="activation3")(x)


class SEBlock(nn.Module):
    """generator_12.py:209-223: global pool + two StyleConv 1x1s + sigmoid."""

    in_planes: int
    out_planes: int
    dense_depth: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        x = core.global_avg_pool(x)
        x = StyleConv(ip, 1, dtype=self.dtype, name="conv1")(x, w)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        x = StyleConv(od, 1, dtype=self.dtype, name="conv2")(x, w)
        return nn.sigmoid(x)


class SEStyleBlock(nn.Module):
    """generator_12.py:226-238."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        x = StyleBlock(self.in_planes, self.out_planes, self.dense_depth,
                       self.kernel_size, dtype=self.dtype, name="convs")(x, w)
        se = SEBlock(self.in_planes, self.out_planes, self.dense_depth,
                     dtype=self.dtype, name="se")(x, w)
        return x * se


class StyleRiR(nn.Module):
    """generator_12.py:241-261: RiR cross-wiring of SEStyleBlocks."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, xs, w):
        x_res, x_tra = xs
        kw = dict(in_planes=self.in_planes, out_planes=self.out_planes,
                  kernel_size=self.kernel_size, dtype=self.dtype)
        r_r = SEStyleBlock(dense_depth=self.dense_depth, name="residual", **kw)(x_res, w)
        r_t = SEStyleBlock(dense_depth=0, name="residual_across", **kw)(x_res, w)
        t_t = SEStyleBlock(dense_depth=0, name="transient", **kw)(x_tra, w)
        t_r = SEStyleBlock(dense_depth=self.dense_depth, name="transient_across", **kw)(x_tra, w)
        return r_r + t_r, r_t + t_t


class StyleBasicBlock(nn.Module):
    """generator_12.py:264-310: attention inside; single 3-branch; StyleConv
    unify/shortcut; DPN concat. Channel math: unify/root -> 2*out + 2*dd,
    else last + dd."""

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
    def __call__(self, x, w):
        d = self.out_planes
        dd = self.dense_depth
        if self.is_unify:
            x = StyleConv(2 * d + dd, 1, dtype=self.dtype, name="unify")(x, w)
        xa = StyleSelfAttention(x.shape[-1], dtype=self.dtype,
                                name="attention")(x, w)
        x_res = jnp.concatenate([xa[..., :d], xa[..., 2 * d:]], axis=-1)
        x_tra = xa[..., d:]
        r3, t3 = StyleRiR(self.in_planes, d, dd, 3, dtype=self.dtype,
                          name="rir_3")((x_res, x_tra), w)
        if self.root:
            x = StyleConv(2 * d + dd, 1, dtype=self.dtype, name="shortcut")(x, w)
        return jnp.concatenate(
            [x[..., :d] + r3[..., :d], t3, x[..., 2 * d:], r3[..., d:]],
            axis=-1,
        )


class StyleTree(nn.Module):
    """generator_12.py:313-381: g6-style truncated concat tree over
    StyleBasicBlocks; subtree rgb mixed into the running rgb skip; root
    output also rendered by to_rgb."""

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
    def __call__(self, x, w, rgb):
        d = self.out_planes

        def block(last, root, unify, name):
            # root widens its bottleneck to in_planes * block_num
            # (generator_12.py:341-343,371-373)
            ip = self.in_planes * self.block_num if root else self.in_planes
            return StyleBasicBlock(last, ip, self.out_planes,
                                   self.dense_depth, root=root, is_unify=unify,
                                   dtype=self.dtype, name=name)

        last = self.last_planes
        xs = []
        # one shared mix_rgb per tree, reused for every subtree iteration
        # (generator_12.py:362-366, self.mix_rgb); at level 1 it exists but
        # is never used in forward — we call-and-discard so the params match
        # the reference and XLA dead-code-eliminates the compute.
        mix_rgb = ToRGB(dtype=self.dtype, name="mix_rgb")
        if self.level == 1:
            _ = mix_rgb(jnp.concatenate([rgb, rgb], axis=-1), w)
        if self.level > 1:
            pr = block(last, False, last < 2 * d, "prev_root")
            xs.append(pr(x, w))
            for i in reversed(range(1, self.level)):
                sub = StyleTree(last, self.in_planes, self.out_planes,
                                self.dense_depth, level=i,
                                block_num=self.block_num, dtype=self.dtype,
                                name=f"level_{i}")
                x, rgb_new = sub(x, w, rgb)
                rgb = rgb + mix_rgb(
                    jnp.concatenate([rgb, rgb_new], axis=-1), w)
                last = sub.get_out_planes()
                xs.append(x)
            for i in range(self.block_num):
                b = block(last, False, False, f"block_{i}")
                x = b(x, w)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        else:
            b0 = block(last, False, last < 2 * d, "block_0")
            x = b0(x, w)
            last = b0.get_out_planes()
            xs.append(x[..., : 2 * d])
            for i in range(1, self.block_num):
                b = block(last, False, False, f"block_{i}")
                x = b(x, w)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        xs.append(x[..., 2 * d:])
        cat = jnp.concatenate(xs, axis=-1)
        out = block(cat.shape[-1], True, False, "root")(cat, w)
        rgb_new = ToRGB(dtype=self.dtype, name="to_rgb")(out, w)
        return out, rgb_new


class _StyleUpsample(nn.Module):
    """generator_12.py:172-186: optional attention + ConvT + PReLU()."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_attention: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        if self.use_attention:
            x = StyleSelfAttention(x.shape[-1], dtype=self.dtype,
                                   name="attention")(x, w)
        x = core.ConvTranspose(self.features, self.kernel_size, self.stride,
                               self.padding, dtype=self.dtype)(x)
        return core.PReLU(dtype=self.dtype)(x)


class Generator12(nn.Module):
    """generator_12.py:384-442."""

    z_dim: int = 256
    planes: int = 32
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        w = MappingNetwork(8, dtype=self.dtype, name="mapping_network")(z)

        const = self.param("initial_constant", core.normal_init(1.0),
                           (1, 4, 4, p * 16))
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = _StyleUpsample(p * 16, 4, 1, 0, use_attention=False,
                           dtype=self.dtype, name="upsample1")(x, w)
        x = x + jnp.broadcast_to(const, (z.shape[0], 4, 4, p * 16)).astype(x.dtype)
        x = SEStyleBlock(p * 8, p * 16, 0, 3, dtype=self.dtype, name="style1")(x, w)
        x = core.PReLU(channels=p * 16, dtype=self.dtype, name="activation1")(x)
        rgb = ToRGB(dtype=self.dtype, name="to_rgb1")(x, w)

        x = _StyleUpsample(p * 8, dtype=self.dtype, name="upsample2")(x, w)
        rgb = core.upsample_smooth(rgb)

        stages = [
            # (last_planes, in, out, dd)
            (p * 8, p * 2, p * 4, int(p * 0.25)),
            (p * 4, p * 1, p * 2, int(p * 0.125)),
            (p * 2, p * 1, p * 1, int(p * 0.125)),
            (p * 1, int(p * 0.5), int(p * 0.5), int(p * 0.125)),
        ]
        for i, (lp, ip, op, dd) in enumerate(stages):
            t = StyleTree(lp, ip, op, dd, level=1, block_num=2,
                          dtype=self.dtype, name=f"tree{i + 1}")
            x, rgb_new = t(x, w, rgb)
            rgb = rgb + ToRGB(dtype=self.dtype, name=f"mix_rgb{i + 1}")(
                jnp.concatenate([rgb, rgb_new], axis=-1), w)
            if i < 3:
                x = _StyleUpsample(stages[i + 1][0], dtype=self.dtype,
                                   name=f"upsample{i + 3}")(x, w)
                rgb = core.upsample_smooth(rgb)
        return jnp.tanh(rgb)
