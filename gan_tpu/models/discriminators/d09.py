"""D9 family — the thesis-line critics.

References (all under /root/reference/discriminators/):
- discriminator_9.py — v1: replication-padded equalized convs (:30-40),
  SAGAN SelfAttention with SE-computed gamma (:58-80), DiscriminatorBlock =
  2 convs + SE gate + Smooth/strided downsample + bicubic residual
  (:123-149), MiniBatchStdDev (:82-94), 2-layer equalized-linear head
  (:181-185); f=64, LeakyReLU(0.2), 3 blocks/stage with attention.
- discriminator_9_2.py — f=16 (only diff).
- discriminator_9_3.py — f=32, several blocks/attentions commented out.
- discriminator_9_4.py — FINAL THESIS CRITIC: f=64, attention removed,
  PReLU activations, SE gates become SEBlock_conv (5x5 GAP + conv stack)
  vs SEBlock_fc dispatched on image_size>4 (:83-128, :141-144).
- discriminator_9_small.py — f=32, one block/stage, LeakyReLU, residual-vs-
  main fusion via SKAttention_conv/fc (:171-201).

EqualizedLinear bias init here is ZERO (bias=0. default, :20-27) — unlike
the G13 family's N(0,1).
"""

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk


class _EqConv9(nn.Module):
    """discriminator_9.py:30-40: replicate padding, explicit padding/stride,
    weight N(0,1)/sqrt(fan_in), bias N(0,1)."""

    features: int
    kernel_size: int
    padding: int = 0
    stride: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        import math

        k = self.kernel_size
        in_ch = x.shape[-1]
        c = 1.0 / math.sqrt(in_ch * k * k)
        kernel = self.param("weight", core.normal_init(1.0),
                            (k, k, in_ch, self.features))
        bias = self.param("bias", core.normal_init(1.0), (self.features,))
        dt = self.dtype or x.dtype
        if self.padding:
            x = jnp.pad(x, ((0, 0), (self.padding,) * 2, (self.padding,) * 2,
                            (0, 0)), mode="edge")
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(dt), (kernel * c).astype(dt),
            (self.stride, self.stride), "VALID", dimension_numbers=dn)
        return y + bias.astype(y.dtype)


class _EqLinear9(nn.Module):
    """discriminator_9.py:20-27: bias init = N(0,1) * bias_val (default 0)."""

    features: int
    bias_val: float = 0.0
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        import math

        fan_in = x.shape[-1]
        w = self.param("weight", core.normal_init(1.0), (fan_in, self.features))
        b = self.param("bias", core.normal_init(self.bias_val), (self.features,))
        dt = self.dtype or x.dtype
        return jnp.dot(x, (w / math.sqrt(fan_in)).astype(dt)) + b.astype(dt)


class _SEBlock9(nn.Module):
    """D9 v1 SE gate (discriminator_9.py:42-56): gap1 + 1x1 + PReLU + 1x1
    + sigmoid."""

    out_planes: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        in_p = x.shape[-1]
        x = core.global_avg_pool(x)
        x = _EqConv9(in_p, 1, dtype=self.dtype, name="conv1")(x)
        x = core.PReLU(channels=in_p, dtype=self.dtype, name="activation1")(x)
        x = _EqConv9(self.out_planes, 1, dtype=self.dtype, name="conv2")(x)
        return nn.sigmoid(x)


class _SelfAttention9(nn.Module):
    """discriminator_9.py:58-80: 1x1 equalized projections, SE gamma."""

    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        f = _EqConv9(c, 1, dtype=self.dtype, name="query")(x).reshape(b, n, c)
        g = _EqConv9(c, 1, dtype=self.dtype, name="key")(x).reshape(b, n, c)
        hx = _EqConv9(c, 1, dtype=self.dtype, name="value")(x).reshape(b, n, c)
        from gan_tpu.ops import attention_core

        # D9-family attention sits under the R1/GP grad-of-grad objectives;
        # attention_core's pallas impl is first-order only, so the
        # discriminator pins the einsum path (any-order autodiff).
        v = attention_core(f, g, hx, impl="einsum").reshape(b, h, w, c)
        o = _EqConv9(c, 1, dtype=self.dtype, name="self_att")(v)
        gamma = _SEBlock9(c, dtype=self.dtype, name="gamma")(o)
        return gamma * o + x


class _SEBlockConv94(nn.Module):
    """discriminator_9_4.py:83-109: gap5 + 2x[EqConv3+PReLU] + gap1 +
    1x[EqLin+PReLU] + EqLin + sigmoid (no BN, zero-bias linears).

    The convs are UNPADDED (reference EqualizedConv2d padding default 0):
    5x5 -> 3x3 -> 1x1 before the gap1 — caught by the round-2 torch-import
    golden parity (a padded version kept 5x5 throughout; same param
    count, different value)."""

    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        b, c = x.shape[0], x.shape[-1]
        assert x.shape[1] >= 8
        x = sk.adaptive_avg_pool(x, 5)
        for i in range(2):
            x = _EqConv9(c, 3, padding=0, dtype=self.dtype, name=f"conv{i}")(x)
            x = core.PReLU(channels=c, dtype=self.dtype, name=f"act{i}")(x)
        z = sk.adaptive_avg_pool(x, 1).reshape(b, c)
        z = _EqLinear9(c, dtype=self.dtype, name="fc0")(z)
        z = core.PReLU(channels=c, dtype=self.dtype, name="fc0_act")(z)
        z = _EqLinear9(c, dtype=self.dtype, name="fc_out")(z)
        return nn.sigmoid(z)[:, None, None, :]


class _SEBlockFC94(nn.Module):
    """discriminator_9_4.py:111-128: gap1 + 2x[EqLin+PReLU] + EqLin +
    sigmoid."""

    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        b, c = x.shape[0], x.shape[-1]
        z = sk.adaptive_avg_pool(x, 1).reshape(b, c)
        for i in range(2):
            z = _EqLinear9(c, dtype=self.dtype, name=f"fc{i}")(z)
            z = core.PReLU(channels=c, dtype=self.dtype, name=f"fc{i}_act")(z)
        z = _EqLinear9(c, dtype=self.dtype, name="fc_out")(z)
        return nn.sigmoid(z)[:, None, None, :]


class _SKAttention9s(nn.Module):
    """discriminator_9_small.py:83-168: SK attention, conv trunk depth 3 /
    fc depths (2 conv-variant, 4 fc-variant), fc_sub [EqLin+PReLU]+EqLin,
    no BN, zero-bias linears."""

    m: int
    conv_variant: bool
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, feas):
        b, c = feas.shape[0], feas.shape[-1]
        fea_u = jnp.sum(feas, axis=1)
        if self.conv_variant:
            assert feas.shape[2] >= 8
            x = sk.adaptive_avg_pool(fea_u, 5)
            for i in range(3):
                x = _EqConv9(c, 3, padding=1, dtype=self.dtype,
                             name=f"conv{i}")(x)
                x = core.PReLU(channels=c, dtype=self.dtype, name=f"cact{i}")(x)
            z = sk.adaptive_avg_pool(x, 1).reshape(b, c)
            n_fc = 2
        else:
            z = sk.adaptive_avg_pool(fea_u, 1).reshape(b, c)
            n_fc = 4
        for i in range(n_fc):
            z = _EqLinear9(c, dtype=self.dtype, name=f"fc{i}")(z)
            z = core.PReLU(channels=c, dtype=self.dtype, name=f"fact{i}")(z)
        vecs = []
        for i in range(self.m):
            v = _EqLinear9(c, dtype=self.dtype, name=f"fc_sub_{i}_0")(z)
            v = core.PReLU(channels=c, dtype=self.dtype,
                           name=f"fc_sub_{i}_act")(v)
            v = _EqLinear9(c, dtype=self.dtype, name=f"fc_sub_{i}_1")(v)
            vecs.append(v)
        att = jax.nn.softmax(jnp.stack(vecs, axis=1), axis=1)
        return att[:, :, None, None, :]


@dataclasses.dataclass(frozen=True)
class _D9Variant:
    features: int = 64
    act: str = "lrelu"          # 'lrelu' (0.2) | 'prelu'
    se: str = "v1"              # 'v1' | 'v94' | 'sk'
    # layer plan before MiniBatchStdDev: 'A' = SelfAttention, or
    # (channel multiplier, downsample?, image size for SE dispatch)
    plan: Tuple = (
        "A", (1, False, 64), (1, False, 64), (2, True, 32),
        "A", (2, False, 32), (2, False, 32), (4, True, 16),
        "A", (4, False, 16), (4, False, 16), (8, True, 8),
        "A", (8, False, 8), (8, False, 8), (16, True, 4),
        "A",
    )
    # plan after MiniBatchStdDev: (downsample?, image size); channels fixed
    tail: Tuple = ((False, 4), (False, 4), (True, 2))


class _D9Block(nn.Module):
    out_features: int
    downsample: bool
    image_size: int
    variant: _D9Variant
    dtype: jnp.dtype = None

    def _act(self, x, ch, name):
        if self.variant.act == "prelu":
            return core.PReLU(channels=ch, dtype=self.dtype, name=name)(x)
        return core.leaky_relu(x, 0.2)

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_f = x.shape[-1]
        of = self.out_features
        if self.downsample:
            residual = core.downsample_smooth(x)
            residual = _EqConv9(of, 1, dtype=self.dtype,
                                name="residual_conv")(residual)
        else:
            residual = x
        y = _EqConv9(in_f, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        y = self._act(y, in_f, "act1")
        y = _EqConv9(of, 3, padding=1, dtype=self.dtype, name="conv2")(y)
        y = self._act(y, of, "act2")
        if self.downsample:
            y = core.smooth(y)
            y = _EqConv9(of, 3, padding=1, stride=2, dtype=self.dtype,
                         name="down_conv")(y)
            y = self._act(y, of, "act3")
        if self.variant.se == "sk":
            att = _SKAttention9s(2, conv_variant=self.image_size > 4,
                                 dtype=self.dtype, name="sk_attention")
            feas = jnp.stack([residual, y], axis=1)
            return sk.sk_fuse(feas, att(feas))
        if self.variant.se == "v94":
            gate_cls = _SEBlockConv94 if self.image_size > 4 else _SEBlockFC94
            y = y * gate_cls(dtype=self.dtype, name="se")(y)
        else:
            y = y * _SEBlock9(of, dtype=self.dtype, name="se")(y)
        return y + residual


class _D9Base(nn.Module):
    variant: _D9Variant = _D9Variant()
    remat: bool = True  # per-block remat: full-size D9_4 activations under
    # the GP double-backward exceed HBM otherwise
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        v = self.variant
        f = v.features
        blk_cls = (nn.remat(_D9Block, static_argnums=(2,))
                   if self.remat else _D9Block)
        x = _EqConv9(f, 3, padding=1, dtype=self.dtype, name="from_rgb")(x)
        if v.act == "prelu":
            x = core.PReLU(channels=f, dtype=self.dtype, name="pre_act")(x)
        else:
            x = core.leaky_relu(x, 0.2)

        ai = bi = 0
        for item in v.plan:
            if item == "A":
                x = _SelfAttention9(dtype=self.dtype, name=f"attn_{ai}")(x)
                ai += 1
            else:
                mult, ds, size = item
                x = blk_cls(f * mult, ds, size, v, dtype=self.dtype,
                            name=f"block_{bi}")(x, train)
                bi += 1
        x = core.minibatch_stddev(x, group_size=4)
        c = f * 16 + 1
        for ds, size in v.tail:
            x = blk_cls(c, ds, size, v, dtype=self.dtype,
                        name=f"block_{bi}")(x, train)
            bi += 1
        x = x.reshape(x.shape[0], -1)
        x = _EqLinear9(2 * 2 * c, dtype=self.dtype, name="fc1")(x)
        if v.act == "prelu":
            x = core.PReLU(channels=2 * 2 * c, dtype=self.dtype,
                           name="fc_act")(x)
        else:
            x = core.leaky_relu(x, 0.2)
        return _EqLinear9(1, dtype=self.dtype, name="fc2")(x)


_PLAN_NO_ATTN = (
    (1, False, 64), (1, False, 64), (2, True, 32),
    (2, False, 32), (2, False, 32), (4, True, 16),
    (4, False, 16), (4, False, 16), (8, True, 8),
    (8, False, 8), (8, False, 8), (16, True, 4),
)

# D9_3 keeps: attn0, one plain block/stage (the second), d-blocks, attn2
# (discriminator_9_3.py:158-177 commenting pattern)
_PLAN_93 = (
    "A", (1, False, 64), (2, True, 32),
    (2, False, 32), (4, True, 16),
    "A", (4, False, 16), (8, True, 8),
    (8, False, 8), (16, True, 4),
)


def Discriminator9(dtype=None):
    return _D9Base(_D9Variant(features=64), dtype=dtype)


def Discriminator9_2(dtype=None):
    return _D9Base(_D9Variant(features=16), dtype=dtype)


def Discriminator9_3(dtype=None):
    return _D9Base(
        _D9Variant(features=32, plan=_PLAN_93, tail=((False, 4), (True, 2))),
        dtype=dtype,
    )


def Discriminator9_4(features: int = 64, dtype=None, remat: bool = True):
    return _D9Base(
        _D9Variant(features=features, act="prelu", se="v94",
                   plan=_PLAN_NO_ATTN),
        remat=remat,
        dtype=dtype,
    )


def Discriminator9Small(dtype=None):
    return _D9Base(
        _D9Variant(
            features=32, se="sk",
            plan=((2, True, 32), (4, True, 16), (8, True, 8), (16, True, 4)),
            tail=((True, 2),),
        ),
        dtype=dtype,
    )
