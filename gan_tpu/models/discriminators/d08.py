"""D8 — labml-annotated StyleGAN2 discriminator.

Reference: /root/reference/discriminators/discriminator_8.py:259-325.
Equalized convs with bias init ONES (labml convention, :108-112 — unlike
the N(0,1) biases of the D9/G13 families), 1x1 fromRGB, residual blocks
scaled 1/sqrt(2) (:177), Smooth+bicubic DownSample (:236-257),
MiniBatchStdDev (:192-233), parametric log_resolution; features
[min(512, 64*2^i)], final 3x3 conv + linear head on the 2x2 map.
"""

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class _EqConv8(nn.Module):
    """labml EqualizedConv2d: zero padding, bias init ones."""

    features: int
    kernel_size: int
    padding: int = 0
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        c = 1.0 / math.sqrt(in_ch * k * k)
        kernel = self.param("weight", core.normal_init(1.0),
                            (k, k, in_ch, self.features))
        bias = self.param("bias", nn.initializers.ones, (self.features,))
        dt = self.dtype or x.dtype
        if self.padding:
            x = jnp.pad(x, ((0, 0), (self.padding,) * 2, (self.padding,) * 2,
                            (0, 0)))
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(dt), (kernel * c).astype(dt), (1, 1), "VALID",
            dimension_numbers=dn)
        return y + bias.astype(y.dtype)


class _EqLinear8(nn.Module):
    """labml EqualizedLinear: bias init = ones * bias_val."""

    features: int
    bias_val: float = 0.0
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        w = self.param("weight", core.normal_init(1.0), (fan_in, self.features))
        b = self.param("bias", nn.initializers.constant(self.bias_val),
                       (self.features,))
        dt = self.dtype or x.dtype
        return jnp.dot(x, (w / math.sqrt(fan_in)).astype(dt)) + b.astype(dt)


class _D8Block(nn.Module):
    """discriminator_8.py:150-190: two 3x3 convs + downsample, residual
    via DownSample + 1x1, scaled 1/sqrt(2)."""

    out_features: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        residual = core.downsample_smooth(x)
        residual = _EqConv8(self.out_features, 1, dtype=self.dtype,
                            name="residual_conv")(residual)
        y = _EqConv8(in_f, 3, 1, dtype=self.dtype, name="conv1")(x)
        y = core.leaky_relu(y, 0.2)
        y = _EqConv8(self.out_features, 3, 1, dtype=self.dtype, name="conv2")(y)
        y = core.leaky_relu(y, 0.2)
        y = core.downsample_smooth(y)
        return (y + residual) * (1.0 / math.sqrt(2.0))


def _minibatch_stddev_d8(x: jax.Array, group_size: int = 4) -> jax.Array:
    """labml MiniBatchStdDev (discriminator_8.py:192-233): same flatten
    quirk as D9's (view(group_size, -1))."""
    return core.minibatch_stddev(x, group_size=group_size)


class Discriminator8(nn.Module):
    log_resolution: int = 6  # get_8 passes log2(64) (get_discriminator.py:85)
    n_features: int = 64
    max_features: int = 512
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        x = _EqConv8(self.n_features, 1, dtype=self.dtype, name="from_rgb")(x)
        x = core.leaky_relu(x, 0.2)
        features = [
            min(self.max_features, self.n_features * (2 ** i))
            for i in range(self.log_resolution - 1)
        ]
        for i in range(len(features) - 1):
            x = _D8Block(features[i + 1], dtype=self.dtype,
                         name=f"block_{i}")(x)
        x = _minibatch_stddev_d8(x)
        final = features[-1] + 1
        x = _EqConv8(final, 3, dtype=self.dtype, name="conv")(x)
        x = x.reshape(x.shape[0], -1)
        return _EqLinear8(1, dtype=self.dtype, name="final")(x)
