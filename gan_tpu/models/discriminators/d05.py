"""D5 family — RiR (ResNet-in-ResNet) classifiers/critics.

- Discriminator5: /root/reference/discriminators/discriminator_5.py —
  BN variant, 8 RiRBlocks x 3 ResnetInit layers, Sigmoid head.
- Discriminator5WGANGP: discriminator_5_wgangp.py — BN stripped, 2-layer
  RiR blocks, 512->1024->1 conv head, critic.
- Discriminator5WGANGPSN: discriminator_5_wgangpsn.py — spectral norm on
  all convs, LeakyReLU 0.1, 3-layer blocks, direct 4x4 head ("without this
  convolution, loss will soon be nan", :85).
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class RiRInit5(nn.Module):
    """discriminator_5.py:6-46: 4 full 3x3 convs, optional 1x1 shortcut,
    additive fusion (+ BN) + LeakyReLU."""

    out_channel: int
    stride: int = 1
    use_bn: bool = True
    sn: bool = False
    slope: float = 0.2
    dtype: jnp.dtype = None

    def _conv(self, feats, k, s, p, name):
        if self.sn:
            return core.SNConv(feats, k, s, p, dtype=self.dtype, name=name)
        return core.Conv(feats, k, s, p, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, xs, train: bool = True, update_sn: bool = True):
        x_res, x_tra = xs
        oc, s = self.out_channel, self.stride
        kw = {"update_stats": update_sn} if self.sn else {}
        r_r = self._conv(oc, 3, s, 1, "residual_stream_conv")(x_res, **kw)
        r_t = self._conv(oc, 3, s, 1, "residual_stream_conv_across")(x_res, **kw)
        t_t = self._conv(oc, 3, s, 1, "transient_stream_conv")(x_tra, **kw)
        t_r = self._conv(oc, 3, s, 1, "transient_stream_conv_across")(x_tra, **kw)
        if x_res.shape[-1] != oc or s != 1:
            sc = self._conv(oc, 1, s, 0, "short_cut")(x_res, **kw)
        else:
            sc = x_res
        res = r_r + t_r + sc
        tra = r_t + t_t
        if self.use_bn:
            res = core.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name="residual_bn")(res)
            tra = core.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name="transient_bn")(tra)
        return core.leaky_relu(res, self.slope), core.leaky_relu(tra, self.slope)


class RiRBlock5(nn.Module):
    out_channel: int
    layer_num: int
    stride: int
    use_bn: bool = True
    sn: bool = False
    slope: float = 0.2
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, xs, train: bool = True, update_sn: bool = True):
        strides = [self.stride] + [1] * (self.layer_num - 1)
        for i, s in enumerate(strides):
            xs = RiRInit5(self.out_channel, s, use_bn=self.use_bn, sn=self.sn,
                          slope=self.slope, dtype=self.dtype,
                          name=f"layer_{i}")(xs, train, update_sn)
        return xs


class _D5Base(nn.Module):
    layer_num: int = 3
    use_bn: bool = True
    sn: bool = False
    slope: float = 0.2
    head: str = "sigmoid"  # 'sigmoid' | 'wgan' | 'sn'
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        base = 64
        kw = {"update_stats": update_sn} if self.sn else {}

        def pre(name):
            def f(v):
                if self.sn:
                    v = core.SNConv(base, 3, 1, 1, dtype=self.dtype,
                                    name=f"{name}_conv")(v, **kw)
                else:
                    v = core.Conv(base, 3, 1, 1, dtype=self.dtype,
                                  name=f"{name}_conv")(v)
                if self.use_bn:
                    v = core.BatchNorm(use_running_average=not train,
                                       dtype=self.dtype, name=f"{name}_bn")(v)
                return core.leaky_relu(v, self.slope)
            return f

        xs = (pre("residual_pre")(x), pre("transient_pre")(x))
        specs = [
            (base, 1), (base, 1), (base * 2, 2), (base * 2, 2),
            (base * 2, 1), (base * 4, 2), (base * 4, 2), (base * 4, 1),
        ]
        for i, (oc, s) in enumerate(specs):
            xs = RiRBlock5(oc, self.layer_num, s, use_bn=self.use_bn,
                           sn=self.sn, slope=self.slope, dtype=self.dtype,
                           name=f"rir{i + 1}")(xs, train, update_sn)
        h = jnp.concatenate(xs, axis=-1)
        if self.head == "wgan":
            h = core.Conv(1024, 4, 1, 0, dtype=self.dtype)(h)
            h = core.leaky_relu(h, 0.2)
            h = core.Conv(1, 1, 1, 0, dtype=self.dtype)(h)
        elif self.head == "sn":
            h = core.SNConv(1, 4, 1, 0, dtype=self.dtype)(h, **kw)
        else:
            h = core.Conv(1, 4, 1, 0, dtype=self.dtype)(h)
        h = h.reshape(h.shape[0], -1)
        if self.head == "sigmoid":
            h = jax.nn.sigmoid(h)
        return h


def Discriminator5(dtype=None):
    return _D5Base(layer_num=3, use_bn=True, sn=False, slope=0.2,
                   head="sigmoid", dtype=dtype)


def Discriminator5WGANGP(dtype=None):
    return _D5Base(layer_num=2, use_bn=False, sn=False, slope=0.2,
                   head="wgan", dtype=dtype)


def Discriminator5WGANGPSN(dtype=None):
    return _D5Base(layer_num=3, use_bn=False, sn=True, slope=0.1,
                   head="sn", dtype=dtype)
