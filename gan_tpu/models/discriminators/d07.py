"""D7 family — ShuffleNetV2 critics.

Reference: /root/reference/discriminators/discriminator_7_wgangp.py
(docstring cites arXiv 1807.11164): pre 3x3 conv to 32, four stages of
ShuffleUnits (stride-2 entry + `repeat` stride-1 units), stage widths
[116,232,464,928] (ratio=1), 4x4 head conv, critic output. LeakyReLU
default slope (0.01).

discriminator_7_wgangpsn.py: spectral norm everywhere, LeakyReLU 0.1,
ratio=2 -> [244,488,976,1952], stage repeats (4,7,4,4).
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class ShuffleUnit7(nn.Module):
    out_channels: int
    stride: int
    sn: bool = False
    slope: float = 0.01  # torch nn.LeakyReLU() default
    dtype: jnp.dtype = None

    def _conv(self, feats, k, s, p, groups, name):
        if self.sn:
            # SNConv has no groups support need; depthwise SN convs exist in
            # the reference — handled via groups param below
            return core.SNConv(feats, k, s, p, dtype=self.dtype, name=name) \
                if groups == 1 else _SNGroupConv(feats, k, s, p, groups,
                                                 dtype=self.dtype, name=name)
        return core.Conv(feats, k, s, p, groups=groups, dtype=self.dtype,
                         name=name)

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        in_ch = x.shape[-1]
        kw = {"update_stats": update_sn} if self.sn else {}
        if self.stride != 1 or in_ch != self.out_channels:
            shortcut, residual = x, x
            res_in = in_ch
        else:
            half = in_ch // 2
            shortcut, residual = x[..., :half], x[..., half:]
            res_in = half

        r = self._conv(res_in, 1, 1, 0, 1, "res_conv1")(residual, **kw)
        r = core.leaky_relu(r, self.slope)
        r = self._conv(res_in, 3, self.stride, 1, res_in, "res_dw")(r, **kw)
        if self.stride != 1 or in_ch != self.out_channels:
            r = self._conv(self.out_channels // 2, 1, 1, 0, 1, "res_conv2")(r, **kw)
        else:
            r = self._conv(res_in, 1, 1, 0, 1, "res_conv2")(r, **kw)
        r = core.leaky_relu(r, self.slope)

        if self.stride != 1 or in_ch != self.out_channels:
            s = self._conv(in_ch, 3, self.stride, 1, in_ch, "sc_dw")(shortcut, **kw)
            s = self._conv(self.out_channels // 2, 1, 1, 0, 1, "sc_conv")(s, **kw)
            s = core.leaky_relu(s, self.slope)
        else:
            s = shortcut
        out = jnp.concatenate([s, r], axis=-1)
        return core.channel_shuffle(out, 2)


class _SNGroupConv(nn.Module):
    """Spectral-norm depthwise conv (torch spectral_norm(Conv2d(groups=C)))."""

    features: int
    kernel_size: int
    stride: int
    padding: int
    groups: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        import jax
        from gan_tpu.models.core import SpectralNorm, torch_bias_init, torch_kernel_init, pad_nhwc

        k = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k * k
        kernel = self.param(
            "kernel", torch_kernel_init,
            (k, k, in_ch // self.groups, self.features),
        )
        kernel = SpectralNorm(name="sn")(kernel, update_stats)
        x = pad_nhwc(x, (self.padding, self.padding), "zeros")
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (self.stride, self.stride), "VALID",
            dimension_numbers=dn, feature_group_count=self.groups,
        )
        b = self.param("bias", torch_bias_init(fan_in), (self.features,))
        return y + b.astype(y.dtype)


class _D7Base(nn.Module):
    out_channels: tuple
    repeats: tuple
    sn: bool = False
    slope: float = 0.01
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        kw = {"update_stats": update_sn} if self.sn else {}
        if self.sn:
            x = core.SNConv(32, 3, 1, 1, dtype=self.dtype, name="pre")(x, **kw)
        else:
            x = core.Conv(32, 3, 1, 1, dtype=self.dtype, name="pre")(x)
        for si, (oc, rep) in enumerate(zip(self.out_channels, self.repeats)):
            x = ShuffleUnit7(oc, 2, sn=self.sn, slope=self.slope,
                             dtype=self.dtype,
                             name=f"stage{si + 2}_unit0")(x, train, update_sn)
            for ui in range(rep):
                x = ShuffleUnit7(oc, 1, sn=self.sn, slope=self.slope,
                                 dtype=self.dtype,
                                 name=f"stage{si + 2}_unit{ui + 1}")(x, train, update_sn)
        if self.sn:
            x = core.SNConv(1, 4, 1, 0, dtype=self.dtype, name="conv5")(x, **kw)
        else:
            x = core.Conv(1, 4, 1, 0, dtype=self.dtype, name="conv5")(x)
        return x.reshape(x.shape[0], -1)


def Discriminator7WGANGP(dtype=None):
    return _D7Base(out_channels=(116, 232, 464, 928), repeats=(3, 7, 3, 3),
                   sn=False, slope=0.01, dtype=dtype)


def Discriminator7WGANGPSN(dtype=None):
    return _D7Base(out_channels=(244, 488, 976, 1952), repeats=(4, 7, 4, 4),
                   sn=True, slope=0.1, dtype=dtype)
