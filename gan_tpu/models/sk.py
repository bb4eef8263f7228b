"""Selective-Kernel machinery for the G13-family generators (and the D9
critics that borrow SEBlock_conv/SK fusion).

References: /root/reference/generators/generator_13.py:73-241 (v13 style:
no BatchNorm, MappingNetwork sub-stacks) and generator_13_5.py:41-295
(v13_5 style: BatchNorm1d/2d interleaved, shallower stacks). A `bn` flag
selects between them; every sub-stack depth matches its reference file.
"""

import dataclasses
import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class Precomputed(NamedTuple):
    """A per-site style vector precomputed by the G13_5 style bank
    (models/style_bank.py): (B, C) for plain sites, (S, B, C) for
    vmap/folded pair sites. Passed down the generator tree IN PLACE of the
    latent w; ModulatedConv13/PairedModulatedConv consume it directly and
    skip their per-site to_style sub-stacks."""

    s: jax.Array


def style_sub(w, name: str):
    """Select a child's slice of the style pytree. Identity when w is the
    latent (classic mode) or an already-resolved Precomputed leaf."""
    return w[name] if isinstance(w, dict) else w


@dataclasses.dataclass(frozen=True)
class SKStyle:
    """Per-file configuration of the SK/SE stacks.

    | field             | 13  | 13_5 | 13_3 | 13_4 |
    |-------------------|-----|------|------|------|
    | bn                | no  | yes  | yes  | yes  |
    | att_conv_depth    | 3   | 2    | 2    | 3    |
    | att_fc_depth      | 2   | 1    | 1    | 2    |
    | attfc_fc_depth    | 4   | 2    | 2    | 4    |
    | fcsub_depth       | 2   | 1    | 1    | 1    |
    | fcsub_trailing_bn | no  | no   | yes  | yes  |
    | se_conv_depth     | 3   | 2    | 3    | 3    |
    | se_convfc_depth   | 2   | 1    | 2    | 2    |
    | se_fc_depth       | 2   | 2    | 4    | 4    |
    (sources: generator_13.py:73-148,272-312; generator_13_5.py:41-131,
     352-405; generator_13_3.py:41-134,267-320; generator_13_4.py diff)
    """

    bn: bool = False
    att_conv_depth: int = 3
    att_fc_depth: int = 2
    attfc_fc_depth: int = 4
    fcsub_depth: int = 2
    fcsub_trailing_bn: bool = False
    se_conv_depth: int = 3
    se_convfc_depth: int = 2
    se_fc_depth: int = 2


V13 = SKStyle()
V13_5 = SKStyle(bn=True, att_conv_depth=2, att_fc_depth=1, attfc_fc_depth=2,
                fcsub_depth=1, se_conv_depth=2, se_convfc_depth=1,
                se_fc_depth=2)
V13_3 = SKStyle(bn=True, att_conv_depth=2, att_fc_depth=1, attfc_fc_depth=2,
                fcsub_depth=1, fcsub_trailing_bn=True, se_conv_depth=3,
                se_convfc_depth=2, se_fc_depth=4)
V13_4 = dataclasses.replace(V13_3, att_conv_depth=3, att_fc_depth=2,
                            attfc_fc_depth=4)


def _pool_matrix(size: int, out: int):
    """(size, out) averaging matrix reproducing torch AdaptiveAvgPool2d's
    segment math exactly: column i averages rows [floor(i*S/out),
    ceil((i+1)*S/out))."""
    import numpy as np

    p = np.zeros((size, out), np.float32)
    for i in range(out):
        s = (i * size) // out
        e = -(-((i + 1) * size) // out)
        p[s:e, i] = 1.0 / (e - s)
    return p


def adaptive_avg_pool(x: jax.Array, out: int) -> jax.Array:
    """torch AdaptiveAvgPool2d parity on NHWC: segment i spans
    [floor(i*S/out), ceil((i+1)*S/out)).

    Two implementations (identical math):
    - 'slice' (default — matches the persisted flagship compile cache):
      per-segment slice+mean, unrolled at trace time (~25 HLO ops per
      call; out is small: 1 or 5).
    - 'matmul' (GAN_TPU_POOL_IMPL=matmul): one constant averaging matrix
      per axis, applied as two einsums — 2 MXU ops per call instead of
      ~25 slice/reduce/concat ops. The flagship has ~10^2 pool sites
      (SKAttentionConv/SEBlockConv), so this is a program-size lever
      (docs/STATUS.md r3 "perf levers"). Flip the default only together
      with a re-prewarm.
    """
    b, h, w, c = x.shape
    if h == out and w == out:
        return x

    if os.environ.get("GAN_TPU_POOL_IMPL", "slice") == "matmul":
        ph = jnp.asarray(_pool_matrix(h, out), x.dtype)
        pw = ph if w == h else jnp.asarray(_pool_matrix(w, out), x.dtype)
        return jnp.einsum("bhwc,hp,wq->bpqc", x, ph, pw)

    def pool_axis(arr, size, axis):
        segs = []
        for i in range(out):
            s = (i * size) // out
            e = -(-((i + 1) * size) // out)
            segs.append(
                jnp.mean(
                    jax.lax.slice_in_dim(arr, s, e, axis=axis),
                    axis=axis,
                    keepdims=True,
                )
            )
        return jnp.concatenate(segs, axis=axis)

    return pool_axis(pool_axis(x, h, 1), w, 2)


class EqualizedConvRep(nn.Module):
    """G13-family EqualizedConv2d (generator_13.py:48-58): weight ~ N(0,1)
    scaled by 1/sqrt(in*k*k) (no sqrt(2) gain), bias ~ N(0,1), stride 1,
    replication padding (k-1)//2."""

    features: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        c = 1.0 / math.sqrt(in_ch * k * k)
        kernel = self.param(
            "weight", core.normal_init(1.0), (k, k, in_ch, self.features)
        )
        bias = self.param("bias", core.normal_init(1.0), (self.features,))
        dt = self.dtype or x.dtype
        p = (k - 1) // 2
        if p:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dt), (kernel * c).astype(dt), (1, 1), "VALID",
            dimension_numbers=dn,
        )
        return y + bias.astype(y.dtype)


class BatchNorm1d(nn.Module):
    """torch BatchNorm1d on (B, C) vectors."""

    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
            use_fast_variance=not core._EXACT_VARIANCE,
        )(x)


class Mapping13(nn.Module):
    """G13 MappingNetwork (generator_13.py:61-71): n x [EqualizedLinear +
    PReLU(planes)] — NO z-normalization (unlike G12). bn=True inserts
    BatchNorm1d (generator_13_5.py:205-215)."""

    n_layers: int
    bn: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        planes = z.shape[-1]
        for _ in range(self.n_layers):
            z = core.EqualizedLinear(planes, bias_init_val=1.0,
                                     dtype=self.dtype)(z)
            if self.bn:
                z = BatchNorm1d(dtype=self.dtype)(z, train)
            z = core.PReLU(channels=planes, dtype=self.dtype)(z)
        return z


class _FCSub(nn.Module):
    """SK per-branch projection head.
    v13: MappingNetwork(planes, 2) + EqualizedLinear (generator_13.py:90-93)
    v13_5: [EqLinear + BN1d + PReLU] + EqLinear (generator_13_5.py:62-68)
    v13_3/13_4: same + trailing BatchNorm1d (generator_13_3.py:62-70)."""

    style: SKStyle = V13
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        planes = z.shape[-1]
        st = self.style
        z = Mapping13(st.fcsub_depth, bn=st.bn, dtype=self.dtype)(z, train)
        z = core.EqualizedLinear(planes, bias_init_val=1.0,
                                 dtype=self.dtype)(z)
        if st.fcsub_trailing_bn:
            z = BatchNorm1d(dtype=self.dtype)(z, train)
        return z


def _fc_subs(m: int, style: "SKStyle", dtype):
    """The m per-branch SK heads consume the same z with identical shapes:
    run them as ONE nn.vmap'd stacked-weight module (m x fewer HLO ops;
    same params/init via split_rngs). Returns (B, M, C)."""
    V = nn.vmap(
        _FCSub,
        in_axes=(None, None),
        out_axes=1,
        axis_size=m,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True},
    )
    return V(style=style, dtype=dtype, name="fc_subs")


class SKAttentionConv(nn.Module):
    """SK attention with a 5x5-pooled conv trunk (generator_13.py:73-115 /
    generator_13_5.py:41-89). Input feas: (B, M, H, W, C); returns softmax
    (over M) attention of shape (B, M, 1, 1, C)."""

    m: int
    style: SKStyle = V13
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, feas, train: bool = True):
        b = feas.shape[0]
        c = feas.shape[-1]
        st = self.style
        assert feas.shape[2] >= 8, "SKAttention_conv needs spatial >= 8"
        fea_u = jnp.sum(feas, axis=1)
        x = adaptive_avg_pool(fea_u, 5)
        for _ in range(st.att_conv_depth):
            x = EqualizedConvRep(c, 3, dtype=self.dtype)(x)
            if st.bn:
                x = core.BatchNorm(use_running_average=not train,
                                   dtype=self.dtype)(x)
            x = core.PReLU(channels=c, dtype=self.dtype)(x)
        z = adaptive_avg_pool(x, 1).reshape(b, c)
        z = Mapping13(st.att_fc_depth, bn=st.bn, dtype=self.dtype)(z, train)
        att = _fc_subs(self.m, st, self.dtype)(z, train)  # (B, M, C)
        att = jax.nn.softmax(att, axis=1)
        return att[:, :, None, None, :]


class SKAttentionFC(nn.Module):
    """FC-only SK attention (generator_13.py:117-148 /
    generator_13_5.py:92-131)."""

    m: int
    style: SKStyle = V13
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, feas, train: bool = True):
        b = feas.shape[0]
        c = feas.shape[-1]
        st = self.style
        fea_u = jnp.sum(feas, axis=1)
        z = adaptive_avg_pool(fea_u, 1).reshape(b, c)
        z = Mapping13(st.attfc_fc_depth, bn=st.bn, dtype=self.dtype)(z, train)
        att = _fc_subs(self.m, st, self.dtype)(z, train)
        att = jax.nn.softmax(att, axis=1)
        return att[:, :, None, None, :]


def sk_fuse(feas, att):
    """(feas * att).sum(dim=M) with feas (B,M,H,W,C), att (B,M,1,1,C)."""
    return jnp.sum(feas * att, axis=1)


class SKConvT(nn.Module):
    """Learned ConvT-x2 vs bicubic+Smooth upsample, fused by SK attention
    (generator_13.py:151-167; style.bn adds BN after ConvT,
    generator_13_5.py:154-170)."""

    style: SKStyle = V13
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        planes = x.shape[-1]
        a = core.ConvTranspose(planes, 4, 2, 1, dtype=self.dtype)(x)
        if self.style.bn:
            a = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(a)
        a = core.PReLU(channels=planes, dtype=self.dtype)(a)
        bch = core.upsample_smooth(x)
        feas = jnp.stack([a, bch], axis=1)
        att = SKAttentionConv(2, style=self.style, dtype=self.dtype,
                              name="sk_attention")(feas, train)
        return sk_fuse(feas, att)


class ModulatedConv13(nn.Module):
    """G13-family Conv2dWeightModulate (generator_13.py:170-197): carries
    its own to_style (Mapping + EqualizedLinear [+BN1d]); replicate-padded
    modulated conv in scale-conv-demodulate form (see models/style.py)."""

    features: int
    kernel_size: int
    demodulate: bool = True
    bn: bool = False
    eps: float = 1e-8
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        in_ch = x.shape[-1]
        if isinstance(w, Precomputed):
            # style-bank mode: the per-site to_style stack was computed
            # batched across all sites at the generator top; the params
            # live in the bank, not here.
            s = w.s
        else:
            n_map = 1 if self.bn else 2
            s = Mapping13(n_map, bn=self.bn, dtype=self.dtype,
                          name="to_style_mapping")(w, train)
            s = core.EqualizedLinear(in_ch, bias_init_val=1.0,
                                     dtype=self.dtype,
                                     name="to_style_linear")(s)
            if self.bn:
                s = BatchNorm1d(dtype=self.dtype, name="to_style_bn")(s, train)
        k = self.kernel_size
        c = 1.0 / math.sqrt(in_ch * k * k)
        kernel = self.param(
            "weight", core.normal_init(1.0), (k, k, in_ch, self.features)
        )
        dt = self.dtype or x.dtype
        xk = x * s[:, None, None, :].astype(dt)
        p = (k - 1) // 2
        if p:
            xk = jnp.pad(xk, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        dn = jax.lax.conv_dimension_numbers(
            xk.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            xk.astype(dt), (kernel * c).astype(dt), (1, 1), "VALID",
            dimension_numbers=dn,
        )
        if self.demodulate:
            w2 = jnp.sum(jnp.square(kernel * c), axis=(0, 1))
            sigma = jax.lax.rsqrt(
                jnp.matmul(jnp.square(s.astype(jnp.float32)), w2) + self.eps
            )
            y = y * sigma[:, None, None, :].astype(y.dtype)
        return y


class StyleConv13(nn.Module):
    """G13-family StyleConv (generator_13.py:200-215): modulated conv +
    optional per-channel noise (scale ~ U(0.2, 0.3), full-channel randn) +
    bias ~ N(0,1).

    dead_bias reproduces generator_13_5.py:263's latent bug: the bias add
    is computed and DISCARDED (`x + self.bias[...]` as a bare statement).
    The bias parameter still exists (and receives zero gradient), matching
    the reference exactly. Set dead_bias=False to "fix" the bug.
    """

    features: int
    kernel_size: int
    use_noise: bool = False
    bn: bool = False
    dead_bias: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        x = ModulatedConv13(self.features, self.kernel_size, bn=self.bn,
                            dtype=self.dtype, name="conv")(
            x, style_sub(w, "conv"), train)
        if self.use_noise:
            scale_noise = self.param(
                "scale_noise", core.uniform_init(0.2, 0.3), (self.features,)
            )
            noise = jax.random.normal(self.make_rng("noise"), x.shape, x.dtype)
            x = x + scale_noise.astype(x.dtype) * noise
        bias = self.param("bias", core.normal_init(1.0), (self.features,))
        if not self.dead_bias:
            x = x + bias.astype(x.dtype)
        return x


class SEBlockConv(nn.Module):
    """Non-style SE gate with 5x5-pooled conv trunk (generator_13.py:272-297
    / generator_13_5.py:352-381 with fc_bn)."""

    style: SKStyle = V13
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        c = x.shape[-1]
        st = self.style
        assert x.shape[1] >= 8, "SEBlock_conv needs spatial >= 8"
        x = adaptive_avg_pool(x, 5)
        for _ in range(st.se_conv_depth):
            x = EqualizedConvRep(c, 3, dtype=self.dtype)(x)
            if st.bn:
                x = core.BatchNorm(use_running_average=not train,
                                   dtype=self.dtype)(x)
            x = core.PReLU(channels=c, dtype=self.dtype)(x)
        z = adaptive_avg_pool(x, 1).reshape(b, c)
        z = Mapping13(st.se_convfc_depth, bn=st.bn, dtype=self.dtype)(z, train)
        z = core.EqualizedLinear(c, bias_init_val=1.0, dtype=self.dtype)(z)
        if st.bn:
            z = BatchNorm1d(dtype=self.dtype, name="fc_bn")(z, train)
        return nn.sigmoid(z)[:, None, None, :]


class SEBlockFC(nn.Module):
    """FC-only SE gate (generator_13.py:298-312 / generator_13_5.py:386-405)."""

    style: SKStyle = V13
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        b = x.shape[0]
        c = x.shape[-1]
        st = self.style
        z = adaptive_avg_pool(x, 1).reshape(b, c)
        z = Mapping13(st.se_fc_depth, bn=st.bn, dtype=self.dtype)(z, train)
        z = core.EqualizedLinear(c, bias_init_val=1.0, dtype=self.dtype)(z)
        if st.bn:
            z = BatchNorm1d(dtype=self.dtype, name="fc_bn")(z, train)
        return nn.sigmoid(z)[:, None, None, :]
