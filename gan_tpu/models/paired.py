"""Folded-channel implementation of the G13_5 ResnetInit stream pairs.

TPU rationale: nn.vmap'd pairs compute on (2, B, H, W, 48) tensors. XLA's
batching rule already folds the CONVs into feature_group_count=2 calls on
(B, H, W, 96/108), but every surrounding elementwise/normalization op (and
the relayouts XLA inserts around each conv) still lives in the stacked
layout, where the C=48 lane dimension pads to 128 on (8,128) tiles — a
2.67x HBM alloc/traffic waste vs 96->128 (1.33x) for the folded layout
(measured: docs/STATUS.md, layout probe). These modules keep the EXACT
parameter tree of nn.vmap(StyleBlock, variable_axes={'params': 0})
(stacked (2, ...) leaves, same names) so init blobs and checkpoints are
interchangeable, but run the whole spatial chain folded as (B, H, W, 2C):
the modulated convs become one grouped conv, and every elementwise op runs
on lane-aligned folded buffers.

Math parity with the vmapped path is exact except for (a) fp
reassociation inside grouped-vs-batched convolutions and (b) the 'noise'
stream, which draws one (B, H, W, 2C) normal instead of two per-stream
(B, H, W, C) draws — identically distributed, different values
(tests/test_paired.py pins equality with the noise scale zeroed).

Reference semantics mirrored (file:line cites in models/sk.py):
StyleConv13/ModulatedConv13 generator_13.py:170-215 with the 13_5 deltas
(generator_13_5.py:219-295), SKAttentionConv generator_13_5.py:41-89,
StyleBlock generator_13_5.py:298-321, ResnetInit generator_13_5.py:324-351.
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk


def fold_pair(x_a, x_b):
    """Two (B, ..., C) streams -> folded (B, ..., 2C), block layout [a|b]."""
    return jnp.concatenate([x_a, x_b], axis=-1)


def split_pair(x, c: int):
    """Folded (B, ..., 2C) -> the two (B, ..., C) streams."""
    return x[..., :c], x[..., c:]


def _pfold(p):
    """Stacked param (S, C) -> folded (S*C,) matching fold_pair layout."""
    return p.reshape(-1)


def _kfold(kernel):
    """Stacked conv kernel (S, k, k, Ci, Co) -> grouped-conv kernel
    (k, k, Ci, S*Co): feature_group_count=S pairs input block i with output
    block i."""
    return jnp.concatenate([kernel[i] for i in range(kernel.shape[0])],
                           axis=-1)


def _grouped_conv(x, kernel_folded, groups: int, pad: int, dt):
    """VALID grouped conv with replicate ('edge') padding, NHWC."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel_folded.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x.astype(dt), kernel_folded.astype(dt), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=groups,
    )


class PairedPReLU(nn.Module):
    """PReLU with stacked alpha (S, C); applies to folded (..., S*C) input
    (or stacked (S, B, C) input via `stacked=True`)."""

    s: int
    channels: int
    stacked: bool = False
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init),
            (self.s, self.channels),
        )
        a = (alpha[:, None, :] if self.stacked else _pfold(alpha)).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class PairedBNCore(nn.Module):
    """nn.BatchNorm parity with stacked (S, C) params/stats.

    stacked=True: input (S, B, C), per-slice stats over axis 1 (the vmapped
    BatchNorm1d case). stacked=False: folded input (..., S*C), stats over
    all axes but the last (per-slice semantics are preserved because slices
    occupy disjoint channel blocks).
    Mirrors flax: f32 stats, fast variance clipped at 0, momentum update
    skipped at init, output dtype = self.dtype or promoted f32.
    """

    s: int
    features: int
    stacked: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (self.s, f))
        bias = self.param("bias", nn.initializers.zeros, (self.s, f))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda *_: jnp.zeros((self.s, f)), None
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda *_: jnp.ones((self.s, f)), None
        )
        if self.stacked:
            # input (S, B, C): per-slice stats over axis 1
            red = (1,)
            to_store = lambda v: v  # stats already (S, C)
            bcast = lambda v: v[:, None, :]
        else:
            # folded input (..., S*C): all axes but channel; slices occupy
            # disjoint channel blocks so per-slice semantics are preserved
            red = tuple(range(x.ndim - 1))
            to_store = lambda v: v.reshape(self.s, f)
            bcast = lambda v: v.reshape(self.s * f)

        if train:
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, red)
            mu2 = jnp.mean(jnp.square(xf), red)
            var = jnp.maximum(0.0, mu2 - jnp.square(mu))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * to_store(mu)
                ra_var.value = m * ra_var.value + (1 - m) * to_store(var)
            if self.stacked:
                mu, var = mu[:, None, :], var[:, None, :]
        else:
            mu, var = bcast(ra_mean.value), bcast(ra_var.value)
        y = (x - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * bcast(scale) + bcast(bias)
        out_dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return y.astype(out_dt)


class PairedBN1d(nn.Module):
    """Mirrors sk.BatchNorm1d under vmap: child named BatchNorm_0."""

    s: int
    features: int
    stacked: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return PairedBNCore(self.s, self.features, stacked=self.stacked,
                            dtype=self.dtype, name="BatchNorm_0")(x, train)


class PairedBatchNorm(nn.Module):
    """Mirrors core.BatchNorm under vmap (spatial, folded input)."""

    s: int
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return PairedBNCore(self.s, self.features, stacked=False,
                            dtype=self.dtype, name="BatchNorm_0")(x, train)


class PairedEqualizedLinear(nn.Module):
    """core.EqualizedLinear with stacked (S, fan_in, out) weights applied to
    stacked (S, B, fan_in) input."""

    s: int
    fan_in: int
    features: int
    bias_init_val: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z):
        w = self.param(
            "kernel", core.normal_init(1.0), (self.s, self.fan_in, self.features)
        )
        b = self.param(
            "bias", core.normal_init(self.bias_init_val),
            (self.s, self.features),
        )
        dt = self.dtype or z.dtype
        scale = 1.0 / math.sqrt(self.fan_in)
        return (
            jnp.einsum("sbf,sfo->sbo", z, (w * scale).astype(dt))
            + b[:, None, :].astype(dt)
        )


class PairedMapping13(nn.Module):
    """sk.Mapping13 on stacked (S, B, C) input (auto-name parity:
    EqualizedLinear_i / BatchNorm1d_i / PReLU_i)."""

    s: int
    n_layers: int
    bn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        planes = z.shape[-1]
        for i in range(self.n_layers):
            z = PairedEqualizedLinear(
                self.s, planes, planes, bias_init_val=1.0, dtype=self.dtype,
                name=f"EqualizedLinear_{i}",
            )(z)
            if self.bn:
                z = PairedBN1d(self.s, planes, dtype=self.dtype,
                               name=f"BatchNorm1d_{i}")(z, train)
            z = PairedPReLU(self.s, planes, stacked=True,
                            name=f"PReLU_{i}")(z)
        return z


class PairedModulatedConv(nn.Module):
    """sk.ModulatedConv13 pair on folded input (B, H, W, S*Ci) ->
    (B, H, W, S*Co). One grouped conv; style/demodulate per stream."""

    tp_grouped = True  # parallel/mesh.py: exclude from TP output sharding

    s: int
    in_ch: int
    features: int
    kernel_size: int
    demodulate: bool = True
    bn: bool = False
    eps: float = 1e-8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        s_dim, ci, co, k = self.s, self.in_ch, self.features, self.kernel_size
        if isinstance(w, sk.Precomputed):
            # style-bank mode (models/style_bank.py): stacked (S, B, Ci)
            # styles computed batched across all sites; params in the bank
            st = w.s
        else:
            n_map = 1 if self.bn else 2
            z = jnp.broadcast_to(w[None], (s_dim, *w.shape))
            z = PairedMapping13(s_dim, n_map, bn=self.bn, dtype=self.dtype,
                                name="to_style_mapping")(z, train)
            st = PairedEqualizedLinear(
                s_dim, w.shape[-1], ci, bias_init_val=1.0, dtype=self.dtype,
                name="to_style_linear",
            )(z)
            if self.bn:
                st = PairedBN1d(s_dim, ci, dtype=self.dtype,
                                name="to_style_bn")(st, train)
        # st: (S, B, Ci) -> folded (B, S*Ci)
        st_f = jnp.moveaxis(st, 0, 1).reshape(st.shape[1], s_dim * ci)

        c = 1.0 / math.sqrt(ci * k * k)
        kernel = self.param(
            "weight", core.normal_init(1.0), (s_dim, k, k, ci, co)
        )
        dt = self.dtype or x.dtype
        xk = x * st_f[:, None, None, :].astype(dt)
        y = _grouped_conv(xk, _kfold(kernel * c), s_dim, (k - 1) // 2, dt)
        if self.demodulate:
            w2 = jnp.sum(jnp.square(kernel * c), axis=(1, 2))  # (S, Ci, Co)
            sig = jax.lax.rsqrt(
                jnp.einsum("sbi,sio->sbo",
                           jnp.square(st.astype(jnp.float32)), w2)
                + self.eps
            )  # (S, B, Co)
            sig_f = jnp.moveaxis(sig, 0, 1).reshape(sig.shape[1], s_dim * co)
            y = y * sig_f[:, None, None, :].astype(y.dtype)
        return y


class PairedStyleConv(nn.Module):
    """sk.StyleConv13 pair on folded input; noise is one (B, H, W, S*C)
    draw (identically distributed to the vmapped per-stream draws)."""

    s: int
    in_ch: int
    features: int
    kernel_size: int
    use_noise: bool = False
    bn: bool = False
    dead_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        x = PairedModulatedConv(
            self.s, self.in_ch, self.features, self.kernel_size,
            bn=self.bn, dtype=self.dtype, name="conv",
        )(x, sk.style_sub(w, "conv"), train)
        if self.use_noise:
            scale_noise = self.param(
                "scale_noise", core.uniform_init(0.2, 0.3),
                (self.s, self.features),
            )
            noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
            x = x + _pfold(scale_noise).astype(x.dtype) * noise
        bias = self.param(
            "bias", core.normal_init(1.0), (self.s, self.features)
        )
        if not self.dead_bias:
            x = x + _pfold(bias).astype(x.dtype)
        return x


class PairedEqualizedConvRep(nn.Module):
    """sk.EqualizedConvRep pair as one grouped conv on folded input."""

    tp_grouped = True  # parallel/mesh.py: exclude from TP output sharding

    s: int
    in_ch: int
    features: int
    kernel_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        s_dim, ci, k = self.s, self.in_ch, self.kernel_size
        c = 1.0 / math.sqrt(ci * k * k)
        kernel = self.param(
            "weight", core.normal_init(1.0), (s_dim, k, k, ci, self.features)
        )
        bias = self.param("bias", core.normal_init(1.0),
                          (s_dim, self.features))
        dt = self.dtype or x.dtype
        y = _grouped_conv(x, _kfold(kernel * c), s_dim, (k - 1) // 2, dt)
        return y + _pfold(bias).astype(y.dtype)


class PairedFCSubs(nn.Module):
    """sk._fc_subs pair: params stacked (S, M, ...); input (S, B, C) shared
    across branches; output (S, M, B, C). Internally runs as one S*M stack."""

    s: int
    m: int
    features: int
    style: sk.SKStyle
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        sm = self.s * self.m
        zz = jnp.broadcast_to(
            z[:, None], (self.s, self.m, *z.shape[1:])
        ).reshape(sm, *z.shape[1:])
        st = self.style
        # params are stored (S, M, ...) to match the vmapped tree exactly;
        # the _SM* modules reshape to (S*M, ...) at apply time
        z2 = _SMMapping(s=self.s, m=self.m, n_layers=st.fcsub_depth,
                        bn=st.bn, dtype=self.dtype, name="Mapping13_0")(zz, train)
        z2 = _SMEqualizedLinear(self.s, self.m, self.features, self.features,
                                bias_init_val=1.0, dtype=self.dtype,
                                name="EqualizedLinear_0")(z2)
        if st.fcsub_trailing_bn:
            z2 = _SMBN1d(self.s, self.m, self.features, dtype=self.dtype,
                         name="BatchNorm1d_0")(z2, train)
        return z2.reshape(self.s, self.m, *z2.shape[1:])


class _SMEqualizedLinear(nn.Module):
    """EqualizedLinear with (S, M, fan_in, out) storage applied as a
    (S*M,)-stacked einsum."""

    s: int
    m: int
    fan_in: int
    features: int
    bias_init_val: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z):
        w = self.param(
            "kernel", core.normal_init(1.0),
            (self.s, self.m, self.fan_in, self.features),
        )
        b = self.param(
            "bias", core.normal_init(self.bias_init_val),
            (self.s, self.m, self.features),
        )
        dt = self.dtype or z.dtype
        scale = 1.0 / math.sqrt(self.fan_in)
        wf = w.reshape(self.s * self.m, self.fan_in, self.features)
        bf = b.reshape(self.s * self.m, self.features)
        return (
            jnp.einsum("gbf,gfo->gbo", z, (wf * scale).astype(dt))
            + bf[:, None, :].astype(dt)
        )


class _SMBNCore(nn.Module):
    """BN core with (S, M, C) storage, applied on (S*M, B, C)."""

    s: int
    m: int
    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        shp = (self.s, self.m, self.features)
        g = self.s * self.m
        scale = self.param("scale", nn.initializers.ones, shp)
        bias = self.param("bias", nn.initializers.zeros, shp)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda *_: jnp.zeros(shp), None)
        ra_var = self.variable("batch_stats", "var",
                               lambda *_: jnp.ones(shp), None)
        if train:
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=1)
            mu2 = jnp.mean(jnp.square(xf), axis=1)
            var = jnp.maximum(0.0, mu2 - jnp.square(mu))
            if not self.is_initializing():
                mmt = self.momentum
                ra_mean.value = (mmt * ra_mean.value
                                 + (1 - mmt) * mu.reshape(shp))
                ra_var.value = (mmt * ra_var.value
                                + (1 - mmt) * var.reshape(shp))
        else:
            mu = ra_mean.value.reshape(g, self.features)
            var = ra_var.value.reshape(g, self.features)
        y = (x - mu[:, None, :]) * jax.lax.rsqrt(var[:, None, :] + self.epsilon)
        y = (y * scale.reshape(g, 1, self.features)
             + bias.reshape(g, 1, self.features))
        out_dt = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return y.astype(out_dt)


class _SMBN1d(nn.Module):
    s: int
    m: int
    features: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _SMBNCore(self.s, self.m, self.features, dtype=self.dtype,
                         name="BatchNorm_0")(x, train)


class _SMPReLU(nn.Module):
    s: int
    m: int
    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(self.init),
            (self.s, self.m, self.channels),
        )
        a = alpha.reshape(self.s * self.m, 1, self.channels).astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class _SMMapping(nn.Module):
    """Mapping13 with (S, M, ...) storage on (S*M, B, C) input."""

    s: int
    m: int
    n_layers: int = 1
    bn: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        planes = z.shape[-1]
        for i in range(self.n_layers):
            z = _SMEqualizedLinear(self.s, self.m, planes, planes,
                                   bias_init_val=1.0, dtype=self.dtype,
                                   name=f"EqualizedLinear_{i}")(z)
            if self.bn:
                z = _SMBN1d(self.s, self.m, planes, dtype=self.dtype,
                            name=f"BatchNorm1d_{i}")(z, train)
            z = _SMPReLU(self.s, self.m, planes, name=f"PReLU_{i}")(z)
        return z


class PairedSKAttentionConv(nn.Module):
    """sk.SKAttentionConv pair on folded branch stacks (B, M, H, W, S*C);
    returns folded attention (B, M, 1, 1, S*C)."""

    s: int
    m: int
    features: int
    style: sk.SKStyle = sk.V13_5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, feas, train: bool = True):
        b = feas.shape[0]
        c = self.features
        st = self.style
        assert feas.shape[2] >= 8, "SKAttention_conv needs spatial >= 8"
        fea_u = jnp.sum(feas, axis=1)  # (B, H, W, S*C)
        x = sk.adaptive_avg_pool(fea_u, 5)
        for i in range(st.att_conv_depth):
            x = PairedEqualizedConvRep(self.s, c, c, 3, dtype=self.dtype,
                                       name=f"EqualizedConvRep_{i}")(x)
            if st.bn:
                x = PairedBatchNorm(self.s, c, dtype=self.dtype,
                                    name=f"BatchNorm_{i}")(x, train)
            x = PairedPReLU(self.s, c, name=f"PReLU_{i}")(x)
        z = sk.adaptive_avg_pool(x, 1).reshape(b, self.s * c)
        z = jnp.moveaxis(z.reshape(b, self.s, c), 1, 0)  # (S, B, C)
        z = PairedMapping13(self.s, st.att_fc_depth, bn=st.bn,
                            dtype=self.dtype, name="Mapping13_0")(z, train)
        att = PairedFCSubs(self.s, self.m, c, st, dtype=self.dtype,
                           name="fc_subs")(z, train)  # (S, M, B, C)
        att = jax.nn.softmax(att, axis=1)
        # -> folded (B, M, 1, 1, S*C)
        att = jnp.transpose(att, (2, 1, 0, 3)).reshape(b, self.m, self.s * c)
        return att[:, :, None, None, :]


class PairedSKStyleConv(nn.Module):
    """g13_5.SKStyleConv pair on folded input."""

    s: int
    in_ch: int
    features: int
    m: int
    image_size: int
    use_noise: bool
    dead_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        feas = []
        for i in range(self.m):
            f = PairedStyleConv(self.s, self.in_ch, self.features, 3 + 2 * i,
                                use_noise=self.use_noise, bn=True,
                                dead_bias=self.dead_bias, dtype=self.dtype,
                                name=f"conv_{i}")(
                x, sk.style_sub(w, f"conv_{i}"), train)
            f = PairedPReLU(self.s, self.features,
                            name=f"nonlinear_{i}")(f)
            feas.append(f)
        feas = jnp.stack(feas, axis=1)  # (B, M, H, W, S*C)
        if self.image_size > 4:
            att = PairedSKAttentionConv(
                self.s, self.m, self.features, style=sk.V13_5,
                dtype=self.dtype, name="sk_attention",
            )(feas, train)
        else:
            raise NotImplementedError(
                "folded SKAttentionFC not needed: ResnetInit pairs only run "
                "at image_size >= 8 in G13_5 (start_tree is m=1)"
            )
        return jnp.sum(feas * att, axis=1)


class FoldedStyleBlockPair(nn.Module):
    """g13_5.StyleBlock pair on folded (B, H, W, 2*in) input ->
    (B, H, W, 2*(out+dd)). Parameter tree identical to
    nn.vmap(StyleBlock, variable_axes={'params': 0, 'batch_stats': 0})."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    image_size: int
    dead_bias: bool = True
    s: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        s_dim, ip = self.s, self.in_planes
        od = self.out_planes + self.dense_depth
        in_ch = x.shape[-1] // s_dim
        kw = dict(bn=True, dead_bias=self.dead_bias, dtype=self.dtype)
        x = PairedStyleConv(s_dim, in_ch, ip, 1, **kw, name="conv1")(
            x, sk.style_sub(w, "conv1"), train)
        x = PairedPReLU(s_dim, ip, name="activation1")(x)
        if self.m == 1:
            x = PairedStyleConv(s_dim, ip, ip, self.kernel_size,
                                use_noise=True, **kw, name="conv2")(
                x, sk.style_sub(w, "conv2"), train)
            x = PairedPReLU(s_dim, ip, name="activation2")(x)
        else:
            x = PairedSKStyleConv(s_dim, ip, ip, self.m, self.image_size,
                                  use_noise=True, dead_bias=self.dead_bias,
                                  dtype=self.dtype, name="skconv")(
                x, sk.style_sub(w, "skconv"), train)
        x = PairedStyleConv(s_dim, ip, od, 3, **kw, name="conv3")(
            x, sk.style_sub(w, "conv3"), train)
        return x
