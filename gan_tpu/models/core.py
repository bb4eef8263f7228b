"""Core NHWC layer primitives with reference-parity initialization.

The reference zoos (/root/reference/generators, /root/reference/discriminators)
are built from a small set of primitives: stock torch Conv2d/ConvTranspose2d/
Linear/BatchNorm2d (torch default inits), "equalized learning-rate" conv/linear
variants (weights ~ N(0,1) scaled at runtime, e.g.
/root/reference/generators/generator_3_progan.py:5-31), spectral-norm wrapped
convs (/root/reference/discriminators/discriminator_3_wgangpsn.py:14-29), and
a few normalizers (PixNorm, ProGAN StandardDeviation, StyleGAN2
MiniBatchStdDev).

Everything here is TPU-native: NHWC layout, channels-last conv kernels
(kh, kw, in, out), fp32 params with an optional compute dtype so the MXU can
run bf16 while penalties and optimizer math stay fp32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# ---------------------------------------------------------------------------
# Initializers with torch-default parity
# ---------------------------------------------------------------------------

# torch Conv2d / Linear default: kaiming_uniform_(a=sqrt(5))
#   == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
torch_kernel_init = nn.initializers.variance_scaling(
    scale=1.0 / 3.0, mode="fan_in", distribution="uniform"
)


def torch_bias_init(fan_in: int) -> Callable:
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# DCGAN weights_init (/root/reference/units/Weight_Initialization.py:7-13):
# Conv ~ N(0, 0.02); BN scale ~ N(1, 0.02), BN bias = 0.
dcgan_kernel_init = nn.initializers.normal(stddev=0.02)


def dcgan_bn_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def normal_init(std: float = 1.0, mean: float = 0.0) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return mean + std * jax.random.normal(key, shape, dtype)

    return init


def uniform_init(low: float, high: float) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, low, high)

    return init


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope)


class PReLU(nn.Module):
    """torch-parity PReLU: learned slope(s), init 0.25. channels=1 is the
    torch nn.PReLU() default (one shared slope); channels=C matches
    nn.PReLU(C) (per-channel slopes, e.g. the style generators'
    nn.PReLU(planes), /root/reference/generators/generator_12.py:77)."""

    channels: int = 1
    init: float = 0.25
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init), (self.channels,)
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


# ---------------------------------------------------------------------------
# Padding helpers (torch padding_mode parity)
# ---------------------------------------------------------------------------

_PAD_MODES = {"zeros": "constant", "reflect": "reflect", "replicate": "edge"}


def pad_nhwc(x, pad: Tuple[int, int], mode: str):
    """Pad H and W of an NHWC tensor like torch Conv2d padding_mode."""
    ph, pw = pad
    if ph == 0 and pw == 0:
        return x
    jmode = _PAD_MODES[mode]
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=jmode)


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


# ---------------------------------------------------------------------------
# Conv / ConvTranspose / Linear with torch-parity semantics
# ---------------------------------------------------------------------------


class Conv(nn.Module):
    """NHWC conv mirroring torch Conv2d(k, stride, padding, groups,
    padding_mode) semantics and default init."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * k[0] * k[1]
        kinit = self.kernel_init or torch_kernel_init
        binit = self.bias_init or torch_bias_init(fan_in)
        x = pad_nhwc(x, p, self.pad_mode)
        y = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding="VALID",
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
        )(x)
        return y


class ConvTranspose(nn.Module):
    """NHWC transposed conv mirroring torch ConvTranspose2d(k, s, p).

    torch output size: (in - 1) * s - 2p + k. We express this with
    lax.conv_transpose via flax, computing the equivalent padding:
    pad_lo = pad_hi = k - 1 - p on the dilated input.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 4
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        in_ch = x.shape[-1]
        # torch ConvTranspose2d fan_in (for default init) = out_ch*k*k/groups
        # applied to weight of shape (in, out, kh, kw); kaiming_uniform uses
        # fan_in computed from weight: in_ch*k*k is fan_out there. torch uses
        # weight.size(1)*k*k = out_ch*k*k? No: _calculate_fan_in_and_fan_out
        # on (in, out, kh, kw) gives fan_in = out*k*k. Bias bound uses that.
        fan_in = self.features * k[0] * k[1]
        kinit = self.kernel_init or torch_kernel_init
        binit = self.bias_init or torch_bias_init(fan_in)
        pad = (
            (k[0] - 1 - p[0], k[0] - 1 - p[0]),
            (k[1] - 1 - p[1], k[1] - 1 - p[1]),
        )
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
        )(x)
        del in_ch
        return y


class Linear(nn.Module):
    """torch-parity Linear (kaiming-uniform a=sqrt(5) init)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kinit = self.kernel_init or torch_kernel_init
        binit = self.bias_init or torch_bias_init(fan_in)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=self.dtype,
        )(x)


# --- BatchNorm variance mode -------------------------------------------------
#
# flax's default "fast variance" (E[x^2] - E[x]^2, one pass) catastrophically
# cancels when batch statistics are near-degenerate: in a B=2 golden-parity
# run the G13_5 style vectors came out ~6e-4 off torch (which computes
# variance exactly), compounding to O(0.5) relative through the full tree.
# Production keeps the fast one-pass form (quality-neutral at training batch
# sizes over B*H*W samples, and the warm flagship compile cache is built on
# it); value-level parity runs switch to exact two-pass variance with this
# context manager. Trace-time state: it affects modules traced while active.

_EXACT_VARIANCE = False


def exact_batchnorm_variance():
    """Context manager: trace BatchNorms with exact (two-pass) variance."""
    import contextlib

    @contextlib.contextmanager
    def _ctx():
        global _EXACT_VARIANCE
        prev, _EXACT_VARIANCE = _EXACT_VARIANCE, True
        try:
            yield
        finally:
            _EXACT_VARIANCE = prev

    return _ctx()


class BatchNorm(nn.Module):
    """torch-parity BatchNorm2d: eps 1e-5, momentum 0.1 (flax momentum 0.9),
    scale=1/bias=0 init (or DCGAN init), batch statistics during training.

    Under jit + NamedSharding the batch axis is global, so statistics are
    whole-global-batch — the data-parallel cross-replica semantics SURVEY.md
    SS2.6 calls for come free from GSPMD.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            scale_init=self.scale_init,
            bias_init=self.bias_init,
            dtype=self.dtype,
            use_fast_variance=not _EXACT_VARIANCE,
        )(x)


class InstanceNorm(nn.Module):
    """torch-parity InstanceNorm2d(affine=True, track_running_stats=True)
    (used by G4's BasicBlock, /root/reference/generators/generator_4.py:35).

    Training normalizes each sample-channel plane by its own H,W statistics;
    running stats are tracked (mean over the batch of per-instance stats)
    and used only when use_running_average=True.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean = ra_mean.value.reshape(1, 1, 1, c)
            var = ra_var.value.reshape(1, 1, 1, c)
        else:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            if not self.is_initializing():
                # torch tracks UNBIASED var in running stats
                n = x.shape[1] * x.shape[2]
                unbias = n / max(n - 1, 1)
                ra_mean.value = (
                    self.momentum * ra_mean.value
                    + (1 - self.momentum) * jnp.mean(mean.squeeze((1, 2)), axis=0)
                )
                ra_var.value = (
                    self.momentum * ra_var.value
                    + (1 - self.momentum)
                    * jnp.mean(var.squeeze((1, 2)), axis=0) * unbias
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale.astype(y.dtype) + bias.astype(y.dtype)


def channel_shuffle(x: jax.Array, groups: int) -> jax.Array:
    """ShuffleNet channel shuffle, NHWC
    (/root/reference/generators/generator_4.py:9-18)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h, w, groups, c // groups)
        .transpose(0, 1, 2, 4, 3)
        .reshape(b, h, w, c)
    )


def global_avg_pool(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """F.avg_pool2d(x, x.size(2)) analog: NHWC global average."""
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


# ---------------------------------------------------------------------------
# Equalized-learning-rate layers (ProGAN/StyleGAN2 style)
# ---------------------------------------------------------------------------


class EqualizedConv(nn.Module):
    """Equalized conv: weight & bias ~ N(0,1), runtime scale
    sqrt(2)/sqrt(k*k*in) applied to the input (reference applies it to x
    before the conv: /root/reference/generators/generator_3_progan.py:5-17).

    Default pad_mode follows the call-site in the reference (G3 uses
    'reflect' by default; the ProGAN D uses zeros).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    pad_mode: str = "zeros"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        in_ch = x.shape[-1]
        scale = math.sqrt(2.0) / math.sqrt(k[0] * k[1] * in_ch)
        y = Conv(
            features=self.features,
            kernel_size=k,
            stride=self.stride,
            padding=self.padding,
            groups=self.groups,
            use_bias=False,
            pad_mode=self.pad_mode,
            kernel_init=normal_init(1.0),
            dtype=self.dtype,
        )(x * scale)
        if self.use_bias:
            bias = self.param("bias", normal_init(1.0), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class EqualizedConvTranspose(nn.Module):
    """Equalized transposed conv; runtime scale sqrt(2)/sqrt(in)
    (/root/reference/generators/generator_3_progan.py:20-31)."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 4
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        scale = math.sqrt(2.0) / math.sqrt(in_ch)
        y = ConvTranspose(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            use_bias=False,
            kernel_init=normal_init(1.0),
            dtype=self.dtype,
        )(x * scale)
        bias = self.param("bias", normal_init(1.0), (self.features,))
        return y + bias.astype(y.dtype)


class EqualizedLinear(nn.Module):
    """Equalized linear: weight ~ N(0,1) scaled at runtime by 1/sqrt(fan_in);
    bias initialized as bias_init * N(0,1) — the reference's
    `normal_(empty(out)) * bias` (generator_12.py:60-66), so bias=0 gives
    zeros and bias=1 gives unit-normal."""

    features: int
    bias_init_val: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        scale = 1.0 / math.sqrt(fan_in)
        w = self.param("kernel", normal_init(1.0), (fan_in, self.features))
        b = self.param(
            "bias", normal_init(self.bias_init_val), (self.features,)
        )
        dt = self.dtype or x.dtype
        return jnp.dot(x, (w * scale).astype(dt)) + b.astype(dt)


# ---------------------------------------------------------------------------
# Spectral normalization (explicit power-iteration state)
# ---------------------------------------------------------------------------


class SpectralNorm(nn.Module):
    """Spectral normalization wrapper state for a conv kernel.

    torch parity (/root/reference/discriminators/discriminator_3_wgangpsn.py:
    14-29 uses torch.nn.utils.parametrizations.spectral_norm): the kernel is
    reshaped to (out, -1); one power iteration per training forward updates
    (u, v) under stop_gradient; sigma = u^T W v is differentiable w.r.t. W.

    The u vector lives in the 'spectral' variable collection so it rides the
    train-state pytree through checkpoints (SURVEY.md SS7 hard part 5).
    """

    eps: float = 1e-12

    @nn.compact
    def __call__(self, kernel: jax.Array, update_stats: bool) -> jax.Array:
        # flax conv kernel (kh, kw, in, out) -> torch flattens (out, in*kh*kw)
        out_ch = kernel.shape[-1]
        w = kernel.reshape(-1, out_ch).T  # (out, rest)
        u_var = self.variable(
            "spectral",
            "u",
            lambda key: jax.random.normal(key, (out_ch,)),
            self.make_rng("params") if self.is_initializing() else None,
        )
        u = u_var.value

        def _l2norm(v):
            return v / (jnp.linalg.norm(v) + self.eps)

        w32 = w.astype(jnp.float32)
        v = _l2norm(jnp.matmul(w32.T, u))
        u_new = _l2norm(jnp.matmul(w32, v))
        u_new = jax.lax.stop_gradient(u_new)
        v = jax.lax.stop_gradient(v)
        if update_stats and not self.is_initializing():
            u_var.value = u_new
        sigma = jnp.einsum("i,ij,j->", u_new, w32, v)
        return (kernel.astype(jnp.float32) / sigma).astype(kernel.dtype)


class SNConv(nn.Module):
    """Conv with spectral-normalized kernel (torch spectral_norm(Conv2d))."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    pad_mode: str = "zeros"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        in_ch = x.shape[-1]
        fan_in = in_ch * k[0] * k[1]
        kernel = self.param(
            "kernel", torch_kernel_init, (k[0], k[1], in_ch, self.features)
        )
        kernel = SpectralNorm(name="sn")(kernel, update_stats)
        x = pad_nhwc(x, p, self.pad_mode)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        dt = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dt),
            kernel.astype(dt),
            window_strides=s,
            padding="VALID",
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", torch_bias_init(fan_in), (self.features,))
            y = y + b.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Normalizers / statistics layers
# ---------------------------------------------------------------------------


class PixNorm(nn.Module):
    """ProGAN pixelwise feature norm: x / sqrt(mean_c(x^2) + eps)
    (/root/reference/generators/generator_11.py:9-16)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + self.eps)


def progan_stddev(x: jax.Array, eps: float = 1e-7) -> jax.Array:
    """ProGAN minibatch StandardDeviation feature map: one scalar (mean of
    per-feature batch stddevs) broadcast as an extra channel
    (/root/reference/discriminators/discriminator_3_wgangp_progan.py:7-16;
    note the reference's literal `10e-8` eps).

    NHWC in, NHWC out with C+1 channels. Whole-(global)-batch under GSPMD.
    """
    b, h, w, _ = x.shape
    centered = x - jnp.mean(x, axis=0, keepdims=True)
    std = jnp.sqrt(jnp.mean(jnp.square(centered), axis=0) + eps)
    feat = jnp.full((b, h, w, 1), jnp.mean(std), dtype=x.dtype)
    return jnp.concatenate([x, feat], axis=-1)


def minibatch_stddev(x: jax.Array, group_size: int = 4, eps: float = 1e-8) -> jax.Array:
    """StyleGAN2 MiniBatchStdDev with the reference's exact grouping quirk.

    The reference reshapes (B, C, H, W) -> (group_size, -1) — flattening
    features across the group boundary (/root/reference/discriminators/
    discriminator_9.py:82-94), takes std over dim=0 of that 2-D view, means
    it to one scalar, and appends it as a constant channel. We reproduce the
    same math on NHWC: transpose to NCHW ordering for the flatten so grouping
    matches the reference byte-for-byte.
    """
    b = x.shape[0]
    assert b % group_size == 0, "batch size must be divisible by group_size"
    h, w = x.shape[1], x.shape[2]
    xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(group_size, -1)
    # ddof=1: torch .var() defaults to the UNBIASED estimator (caught by
    # the round-2 torch-import golden parity; biased var skewed the stddev
    # channel ~0.4%)
    std = jnp.sqrt(jnp.var(xc, axis=0, ddof=1) + eps)
    feat = jnp.full((b, h, w, 1), jnp.mean(std), dtype=x.dtype)
    return jnp.concatenate([x, feat], axis=-1)


# ---------------------------------------------------------------------------
# Resampling (bicubic + blur)
# ---------------------------------------------------------------------------

# StyleGAN2 Smooth kernel ([[1,2,1],[2,4,2],[1,2,1]]/16), used by the
# reference's labml-derived UpSample/DownSample (generator_12.py:19-45,
# discriminator_8.py:236-257).
_SMOOTH_KERNEL = jnp.array(
    [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]], dtype=jnp.float32
) / 16.0


def smooth(x: jax.Array) -> jax.Array:
    """Depthwise 3x3 blur with replication padding (torch Smooth uses
    ReplicationPad2d(1), generator_12.py:19-31)."""
    c = x.shape[-1]
    k = jnp.tile(_SMOOTH_KERNEL[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(xp.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )


def _torch_cubic_weights(frac, a: float = -0.75):
    """4-tap cubic convolution weights, torch/OpenCV flavor (Keys a=-0.75;
    jax.image.resize uses a=-0.5 AND antialiases on downsample — both
    break value parity with F.interpolate(mode='bicubic'))."""
    import numpy as np

    def w(d):
        d = np.abs(d)
        return np.where(
            d <= 1.0,
            (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0,
            np.where(d < 2.0, a * (d**3 - 5.0 * d**2 + 8.0 * d - 4.0), 0.0),
        )

    return np.stack([w(frac + 1.0), w(frac), w(1.0 - frac), w(2.0 - frac)])


import functools


@functools.lru_cache(maxsize=None)
def _bicubic_matrix(in_size: int, out_size: int):
    """(out, in) torch-bicubic interpolation matrix (border-replicated
    4-tap Keys a=-0.75). A constant matmul instead of gathers: MXU-friendly
    forward, transpose-matmul backward, no scatter in the grad — and far
    fewer HLO ops per resize site (the flagship has hundreds)."""
    import numpy as np

    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    weights = _torch_cubic_weights(frac)  # (4, out)
    m = np.zeros((out_size, in_size), np.float32)
    for k in range(4):
        idx = np.clip(base + (k - 1), 0, in_size - 1)  # border replicate
        np.add.at(m, (np.arange(out_size), idx), weights[k])
    return m


def _resize_axis_bicubic(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_bicubic_matrix(in_size, out_size), x.dtype)
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, m.T)
    return jnp.moveaxis(out, -1, axis)


def resize_bicubic(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bicubic NHWC resize with exact torch F.interpolate(mode='bicubic',
    align_corners=False) semantics: Keys a=-0.75 kernel, 4 taps per output
    sample, border replication, NO antialiasing (validated value-for-value
    in tests/test_torch_import.py)."""
    x = _resize_axis_bicubic(x, 1, out_hw[0])
    x = _resize_axis_bicubic(x, 2, out_hw[1])
    return x


def upsample_smooth(x: jax.Array, factor: int = 2) -> jax.Array:
    """Reference UpSample: bicubic x2 then Smooth (generator_12.py:34-45)."""
    h, w = x.shape[1] * factor, x.shape[2] * factor
    return smooth(resize_bicubic(x, (h, w)))


def downsample_smooth(x: jax.Array) -> jax.Array:
    """Reference DownSample: Smooth then bicubic x0.5
    (discriminator_8.py:236-257)."""
    x = smooth(x)
    return resize_bicubic(x, (x.shape[1] // 2, x.shape[2] // 2))
