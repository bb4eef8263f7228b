"""Shared machinery for the G6–G11 RiR/DPN/DLA generator family (and the
D6 critic that mirrors it).

One parameterized implementation covers the per-file variations in
/root/reference/generators/generator_{6,7,8,9,10,10_2,11}.py:

- activation: GELU (G6) vs PReLU (G7+)        [generator_6.py:12 vs _7.py:12]
- conv: plain Conv2d vs EqualizedConv2d       [generator_10_2.py:5-20]
- norm: BatchNorm2d vs Pixnorm                [generator_11.py:142-150]
- branches: {3,5,7} multi-kernel vs {3} only  [generator_10.py:125-128]
- attention: none (G6-G8), tree-root (G9, generator_9.py:210,226),
  in-block (G10+, generator_10.py:136,150)
- tree concat: truncated x[:, :2d] per block (G6-G9, generator_6.py:185-188)
  vs full x (G10+, generator_10.py:203-213)
- SelfAttention gamma: 0.1 (G9, generator_9.py:13) vs U(0.03,0.23)
  (G10+, generator_10.py:14)

Channel bookkeeping (get_out_planes) is reproduced exactly — the survey's
property tests sweep it against real shapes.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


def _act(kind: str):
    if kind == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if kind == "prelu":
        return None  # signals module-based activation (owns a param)
    raise ValueError(kind)


class _Act(nn.Module):
    kind: str  # 'gelu' | 'prelu' | 'lrelu001'
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        if self.kind == "prelu":
            return core.PReLU(dtype=self.dtype)(x)
        if self.kind == "lrelu001":
            return core.leaky_relu(x, 0.01)
        return jax.nn.gelu(x, approximate=False)


class _Conv(nn.Module):
    """Conv dispatcher: plain torch-default conv or equalized conv."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    groups: int = 1
    pad_mode: str = "zeros"
    equalized: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        if self.equalized:
            # reference EqualizedConv2d defaults to reflect padding
            # (generator_10_2.py:8)
            return core.EqualizedConv(
                self.features, self.kernel_size, self.stride, self.padding,
                groups=self.groups,
                pad_mode="reflect" if self.padding > 0 else "zeros",
                dtype=self.dtype,
            )(x)
        return core.Conv(
            self.features, self.kernel_size, self.stride, self.padding,
            groups=self.groups, pad_mode=self.pad_mode, dtype=self.dtype,
        )(x)


class _Norm(nn.Module):
    kind: str  # 'bn' | 'pixnorm' | 'none'
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.kind == "none":
            return x
        if self.kind == "pixnorm":
            return core.PixNorm()(x)
        return core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)


class SelfAttention(nn.Module):
    """SAGAN spatial self-attention with the reference's softmax-dim=1 quirk
    (generator_9.py:6-31): scores s[i,j] = <key_i, query_j>, softmax over i
    (the key index) for each j, out_j = sum_i value_i * beta[i,j].

    gamma: scalar, init 0.1 (G9) or U(0.03, 0.23) (G10+).
    """

    embedding_channels: int
    gamma_init: Tuple[float, float] = (0.1, 0.1)  # (low, high); equal = const
    equalized: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = h * w
        e = self.embedding_channels
        conv = lambda feats, name: _Conv(feats, 1, equalized=self.equalized,
                                         dtype=self.dtype, name=name)
        f = conv(e, "key")(x).reshape(b, n, e)
        g = conv(e, "query")(x).reshape(b, n, e)
        hx = conv(e, "value")(x).reshape(b, n, e)
        from gan_tpu.ops import attention_core

        v = attention_core(f, g, hx).reshape(b, h, w, e)
        o = conv(c, "self_att")(v)
        lo, hi = self.gamma_init
        gamma = self.param(
            "gamma",
            (nn.initializers.constant(lo) if lo == hi else core.uniform_init(lo, hi)),
            (),
        )
        return gamma.astype(x.dtype) * o + x


class SEBottleneck(nn.Module):
    """SE-gated bottleneck (generator_6.py:5-38): 1x1 -> norm -> act ->
    depthwise kxk reflect -> norm -> act -> 1x1 to out+dd -> norm; SE gate
    from global pool."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    act: str = "gelu"
    conv_equalized: bool = False
    norm: str = "bn"
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        k = self.kernel_size
        kw = dict(equalized=self.conv_equalized, dtype=self.dtype)
        out = _Conv(ip, 1, **kw)(x)
        out = _Norm(self.norm, self.dtype)(out, train)
        out = _Act(self.act, self.dtype)(out)
        out = _Conv(ip, k, 1, (k - 1) // 2, groups=ip, pad_mode="reflect", **kw)(out)
        out = _Norm(self.norm, self.dtype)(out, train)
        out = _Act(self.act, self.dtype)(out)
        out = _Conv(od, 1, **kw)(out)
        out = _Norm(self.norm, self.dtype)(out, train)
        gate = core.global_avg_pool(out)
        gate = _Conv(ip, 1, **kw)(gate)
        gate = _Act(self.act, self.dtype)(gate)
        gate = _Conv(od, 1, **kw)(gate)
        gate = nn.sigmoid(gate)
        return out * gate


class RiR(nn.Module):
    """ResNet-in-ResNet cross-wiring without shortcut (generator_6.py:41-64):
    residual/transient streams, 4 SE bottlenecks, additive fusion.

    fused=True (default) runs the two same-shape bottleneck pairs as
    nn.vmap'd stacks (half the HLO ops; identical math, params and init
    distributions — see g13_5.ResnetInit for the pattern rationale)."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    act: str = "gelu"
    conv_equalized: bool = False
    norm: str = "bn"
    fused: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, xs, train: bool = True):
        x_res, x_tra = xs
        kw = dict(
            in_planes=self.in_planes, out_planes=self.out_planes,
            kernel_size=self.kernel_size, act=self.act,
            conv_equalized=self.conv_equalized, norm=self.norm, dtype=self.dtype,
        )
        if self.fused:
            VBlock = nn.vmap(
                SEBottleneck,
                in_axes=(0, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True},
            )
            pair = jnp.stack([x_res, x_tra])
            ga = VBlock(dense_depth=self.dense_depth, name="group_dd", **kw)(pair, train)
            gb = VBlock(dense_depth=0, name="group_nodd", **kw)(pair, train)
            r_r, t_r = ga[0], ga[1]
            r_t, t_t = gb[0], gb[1]
        else:
            r_r = SEBottleneck(dense_depth=self.dense_depth, name="residual", **kw)(x_res, train)
            r_t = SEBottleneck(dense_depth=0, name="residual_across", **kw)(x_res, train)
            t_t = SEBottleneck(dense_depth=0, name="transient", **kw)(x_tra, train)
            t_r = SEBottleneck(dense_depth=self.dense_depth, name="transient_across", **kw)(x_tra, train)
        return r_r + t_r, r_t + t_t


class RiRBasicBlock(nn.Module):
    """Dual-path DPN block over RiR streams (generator_6.py:67-131 /
    generator_10.py:99-151)."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    root: bool = False
    is_unify: bool = False
    branches: Sequence[int] = (3, 5, 7)
    act: str = "gelu"
    conv_equalized: bool = False
    norm: str = "bn"
    block_attention: bool = False        # G10+: attention after concat
    attention_gamma: Tuple[float, float] = (0.03, 0.23)
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        nb = len(self.branches)
        if self.is_unify or self.root:
            return 2 * self.out_planes + (nb + 1) * self.dense_depth
        return self.last_planes + nb * self.dense_depth

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.out_planes
        dd = self.dense_depth
        kw = dict(equalized=self.conv_equalized, dtype=self.dtype)
        if self.is_unify:
            x = _Conv(2 * d + dd, 1, **kw)(x)
            x = _Norm(self.norm, self.dtype)(x, train)
        x_res = jnp.concatenate([x[..., :d], x[..., 2 * d:]], axis=-1)
        x_tra = x[..., d:]
        rir_kw = dict(
            in_planes=self.in_planes, out_planes=d, dense_depth=dd,
            act=self.act, conv_equalized=self.conv_equalized, norm=self.norm,
            dtype=self.dtype,
        )
        res_outs, tra_outs = [], []
        for k in self.branches:
            r, t = RiR(kernel_size=k, name=f"rir_{k}", **rir_kw)((x_res, x_tra), train)
            res_outs.append(r)
            tra_outs.append(t)
        if self.root:
            x = _Conv(2 * d + dd, 1, **kw)(x)
            x = _Norm(self.norm, self.dtype)(x, train)
        res_sum_head = x[..., :d]
        for r in res_outs:
            res_sum_head = res_sum_head + r[..., :d]
        tra_sum = tra_outs[0]
        for t in tra_outs[1:]:
            tra_sum = tra_sum + t
        out = jnp.concatenate(
            [res_sum_head, tra_sum, x[..., 2 * d:]]
            + [r[..., d:] for r in res_outs],
            axis=-1,
        )
        if self.block_attention:
            out = SelfAttention(
                out.shape[-1], gamma_init=self.attention_gamma,
                equalized=self.conv_equalized, dtype=self.dtype,
                name="attention",
            )(out)
        return out


class RiRTree(nn.Module):
    """DLA tree over RiRBasicBlocks. style='g6' truncates each chained
    block's contribution to 2*out channels and adds the final dense tail
    (generator_6.py:137-190); style='g10' concatenates full block outputs
    (generator_10.py:158-214). root_attention adds G9's post-root attention.
    """

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    style: str = "g6"  # 'g6' | 'g10'
    branches: Sequence[int] = (3, 5, 7)
    act: str = "gelu"
    conv_equalized: bool = False
    norm: str = "bn"
    root_attention: bool = False
    block_attention: bool = False
    attention_gamma: Tuple[float, float] = (0.03, 0.23)
    dtype: jnp.dtype = None

    def _block(self, last, root, unify, name):
        # the root block widens its bottleneck to in_planes * block_num
        # (generator_6.py:157-159,172-174)
        ip = self.in_planes * self.block_num if root else self.in_planes
        return RiRBasicBlock(
            last, ip, self.out_planes, self.dense_depth,
            root=root, is_unify=unify, branches=self.branches, act=self.act,
            conv_equalized=self.conv_equalized, norm=self.norm,
            block_attention=self.block_attention,
            attention_gamma=self.attention_gamma, dtype=self.dtype, name=name,
        )

    def get_out_planes(self) -> int:
        nb = len(self.branches)
        return 2 * self.out_planes + (nb + 1) * self.dense_depth

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.out_planes
        last = self.last_planes
        xs = []
        if self.level > 1:
            pr = self._block(last, False, last < 2 * d, "prev_root")
            xs.append(pr(x, train))
            for i in reversed(range(1, self.level)):
                sub = RiRTree(
                    last, self.in_planes, self.out_planes, self.dense_depth,
                    level=i, block_num=self.block_num, style=self.style,
                    branches=self.branches, act=self.act,
                    conv_equalized=self.conv_equalized, norm=self.norm,
                    root_attention=self.root_attention,
                    block_attention=self.block_attention,
                    attention_gamma=self.attention_gamma, dtype=self.dtype,
                    name=f"level_{i}",
                )
                x = sub(x, train)
                last = sub.get_out_planes()
                xs.append(x)
            for i in range(self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d] if self.style == "g6" else x)
        else:
            b0 = self._block(last, False, last < 2 * d, "block_0")
            x = b0(x, train)
            last = b0.get_out_planes()
            xs.append(x[..., : 2 * d] if self.style == "g6" else x)
            for i in range(1, self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d] if self.style == "g6" else x)
        if self.style == "g6":
            xs.append(x[..., 2 * d:])
        cat = jnp.concatenate(xs, axis=-1)
        out = self._block(cat.shape[-1], True, False, "root")(cat, train)
        if self.root_attention:
            out = SelfAttention(
                out.shape[-1],
                gamma_init=(0.1, 0.1),
                equalized=self.conv_equalized,
                dtype=self.dtype,
                name="attention",
            )(out)
        return out


class StemSEBottleneck(nn.Module):
    """G6 stem bottleneck, no dense path (generator_6.py:195-231)."""

    in_planes: int
    out_planes: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        ip, op, k = self.in_planes, self.out_planes, self.kernel_size
        gelu = lambda v: jax.nn.gelu(v, approximate=False)
        out = core.Conv(ip, 1, dtype=self.dtype)(x)
        out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = gelu(out)
        out = core.Conv(ip, k, 1, (k - 1) // 2, groups=ip, pad_mode="reflect",
                        dtype=self.dtype)(out)
        out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = gelu(out)
        out = core.Conv(op, 1, dtype=self.dtype)(out)
        out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        gate = core.global_avg_pool(out)
        gate = core.Conv(ip, 1, dtype=self.dtype)(gate)
        gate = gelu(gate)
        gate = core.Conv(op, 1, dtype=self.dtype)(gate)
        return out * nn.sigmoid(gate)


class StemRiR(nn.Module):
    """G6 stem/last RiR with residual shortcut (generator_6.py:234-262)."""

    in_planes: int
    out_planes: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, xs, train: bool = True):
        x_res, x_tra = xs
        kw = dict(in_planes=self.in_planes, out_planes=self.out_planes,
                  kernel_size=self.kernel_size, dtype=self.dtype)
        r_r = StemSEBottleneck(name="residual", **kw)(x_res, train)
        r_t = StemSEBottleneck(name="residual_across", **kw)(x_res, train)
        t_t = StemSEBottleneck(name="transient", **kw)(x_tra, train)
        t_r = StemSEBottleneck(name="transient_across", **kw)(x_tra, train)
        if x_res.shape[-1] != self.out_planes:
            sc = core.Conv(self.out_planes, 1, dtype=self.dtype)(x_res)
            sc = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(sc)
        else:
            sc = x_res
        return r_r + t_r + sc, r_t + t_t


class G6StemBlock(nn.Module):
    """G6 StemBlock (generator_6.py:265-303): pre-convs split the stream
    into residual/transient, block_num StemRiRs, concat, ConvT x2 upsample.
    upsample=False gives the LastBlock variant (:372-403)."""

    out_planes: int
    in_planes: int
    block_num: int
    kernel_size: int
    upsample: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        gelu = lambda v: jax.nn.gelu(v, approximate=False)

        def pre(name):
            def f(v):
                v = core.Conv(self.out_planes, 3, 1, 1, dtype=self.dtype,
                              name=f"{name}_conv")(v)
                v = core.BatchNorm(use_running_average=not train,
                                   dtype=self.dtype, name=f"{name}_bn")(v)
                return gelu(v)
            return f

        x_res = pre("residual_pre")(x)
        x_tra = pre("transient_pre")(x)
        for i in range(self.block_num):
            x_res, x_tra = StemRiR(self.in_planes, self.out_planes,
                                   self.kernel_size, dtype=self.dtype,
                                   name=f"rir_{i}")((x_res, x_tra), train)
        out = jnp.concatenate([x_res, x_tra], axis=-1)
        if self.upsample:
            out = core.ConvTranspose(self.out_planes, 4, 2, 1, dtype=self.dtype)(out)
            out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
            out = gelu(out)
        return out
