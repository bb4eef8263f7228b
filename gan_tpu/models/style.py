"""StyleGAN2-flavored primitives for the G12/G13-family generators.

Reference: /root/reference/generators/generator_12.py (labml-derived
Smooth/UpSample_rgb/EqualizedWeight/EqualizedLinear/MappingNetwork/
Conv2dWeightModulate/StyleConv/ToRGB) and generator_13*.py refinements.

TPU-first design note — per-sample weight-modulated conv
(Conv2dWeightModulate, generator_12.py:85-108): the reference materializes
per-sample weights and runs a groups=B conv. That formulation maps poorly to
XLA (B distinct kernels, no MXU batching). We use the mathematically
identical scale-conv-demodulate form:

    y_b = conv(x_b * s_b, W)                      # one shared-kernel conv
    sigma_{b,o} = rsqrt( sum_{i,kh,kw} (W[o,i,kh,kw] * s_{b,i})^2 + eps )
    out = y * sigma                               # per-sample channel scale

which is one large batched conv (MXU) plus a (B,C)x(C,O) matmul for the
demodulation sums. Equivalence holds because conv is linear in per-input-
channel scaling; this is also how the official StyleGAN2 "fused" path
works on accelerators.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class MappingNetwork(nn.Module):
    """generator_12.py:71-82: L2-normalize z, then n_layers x
    [EqualizedLinear + per-channel PReLU]."""

    n_layers: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z):
        planes = z.shape[-1]
        z = z / jnp.clip(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-12, None
        )
        for _ in range(self.n_layers):
            z = core.EqualizedLinear(planes, dtype=self.dtype)(z)
            z = core.PReLU(channels=planes, dtype=self.dtype)(z)
        return z


class Conv2dWeightModulate(nn.Module):
    """Per-sample modulated conv, scale-conv-demodulate formulation.

    Weight: EqualizedWeight([out, in, k, k]) — N(0,1) scaled by
    1/sqrt(in*k*k) at runtime (generator_12.py:49-57). Input padding is
    replicate-mode (k-1)//2 (generator_12.py:105).
    """

    features: int
    kernel_size: int
    demodulate: bool = True
    eps: float = 1e-8
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, s):
        k = self.kernel_size
        in_ch = x.shape[-1]
        c = 1.0 / math.sqrt(in_ch * k * k)
        kernel = self.param(
            "weight", core.normal_init(1.0), (k, k, in_ch, self.features)
        )
        dt = self.dtype or x.dtype
        w = (kernel * c).astype(dt)
        x = x * s[:, None, None, :].astype(dt)
        if k > 1:
            p = (k - 1) // 2
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w, (1, 1), "VALID", dimension_numbers=dn
        )
        if self.demodulate:
            w2 = jnp.sum(jnp.square(kernel * c), axis=(0, 1))  # (in, out)
            sigma = jax.lax.rsqrt(
                jnp.matmul(jnp.square(s.astype(jnp.float32)), w2) + self.eps
            )
            y = y * sigma[:, None, None, :].astype(y.dtype)
        return y


class StyleConv(nn.Module):
    """generator_12.py:111-128: to_style = MappingNetwork(2 layers) +
    EqualizedLinear(bias=1.0); modulated conv; learned scalar noise gain on
    per-pixel N(0,1) noise; additive per-channel bias (both ~ N(0,1) init).
    """

    features: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        in_ch = x.shape[-1]
        s = MappingNetwork(2, dtype=self.dtype, name="to_style_mapping")(w)
        s = core.EqualizedLinear(in_ch, bias_init_val=1.0, dtype=self.dtype,
                                 name="to_style_linear")(s)
        x = Conv2dWeightModulate(self.features, self.kernel_size,
                                 dtype=self.dtype, name="conv")(x, s)
        scale_noise = self.param("scale_noise", core.normal_init(1.0), (1,))
        bias = self.param("bias", core.normal_init(1.0), (self.features,))
        b, h, wd, _ = x.shape
        noise = jax.random.normal(self.make_rng("noise"), (b, h, wd, 1), x.dtype)
        x = x + scale_noise.astype(x.dtype) * noise
        return x + bias.astype(x.dtype)


class StyleSelfAttention(nn.Module):
    """generator_12.py:131-150: SAGAN attention with StyleConv(k=1)
    projections; gamma ~ U(0.04, 0.08); softmax over the key index (dim=1
    quirk preserved)."""

    embedding_channels: int
    gamma_init: Tuple[float, float] = (0.04, 0.08)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        b, h, wd, c = x.shape
        n = h * wd
        e = self.embedding_channels
        f = StyleConv(e, 1, dtype=self.dtype, name="key")(x, w).reshape(b, n, e)
        g = StyleConv(e, 1, dtype=self.dtype, name="query")(x, w).reshape(b, n, e)
        hx = StyleConv(e, 1, dtype=self.dtype, name="value")(x, w).reshape(b, n, e)
        from gan_tpu.ops import attention_core

        v = attention_core(f, g, hx).reshape(b, h, wd, e)
        o = StyleConv(c, 1, dtype=self.dtype, name="self_att")(v, w)
        gamma = self.param("gamma", core.uniform_init(*self.gamma_init), (1,))
        return gamma.astype(x.dtype) * o + x


class ToRGB(nn.Module):
    """generator_12.py:153-169: style + attention + un-demodulated 1x1
    modulated conv to 3 channels + bias + PReLU(3)."""

    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w):
        planes = x.shape[-1]
        s = MappingNetwork(2, dtype=self.dtype, name="to_style_mapping")(w)
        s = core.EqualizedLinear(planes, bias_init_val=1.0, dtype=self.dtype,
                                 name="to_style_linear")(s)
        x = StyleSelfAttention(planes, dtype=self.dtype, name="attention")(x, w)
        x = Conv2dWeightModulate(3, 1, demodulate=False, dtype=self.dtype,
                                 name="conv")(x, s)
        bias = self.param("bias", core.normal_init(1.0), (3,))
        x = x + bias.astype(x.dtype)
        return core.PReLU(channels=3, dtype=self.dtype, name="activation")(x)
