"""G13_5 — the final thesis generator (planes=48, ~362M params).

Reference: /root/reference/generators/generator_13_5.py:610-631.
Deltas vs G13 (see diff generator_13.py..generator_13_5.py):
- BatchNorm1d/2d interleaved through every SK/SE/mapping stack
- StyleConv noise restored (per-channel scale ~ U(0.2,0.3)); the bias add
  is DEAD CODE upstream (:263: `x + self.bias[...]` discarded) — reproduced
  via dead_bias=True (param exists, receives zero grad); set
  fix_styleconv_bias=True to repair
- ResnetInit: additive stream fusion + PReLU (no SK attention inside)
- BasicBlock: unify/shortcut are StyleBlocks (+PReLU); SE-gated residual
  add (feas = x[:, :d] + r3[:, :d] * SEBlock(r3[:, :d])) replaces the
  scale-parameter residual
- ToRGB is style-free: EqualizedConv k5 + BatchNorm (:470-493)
- Tree rgb accumulation is a plain add (:562)
- 12-layer mapping network (:614)
"""

import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core
from gan_tpu.models import sk


class SKStyleConv(nn.Module):
    """generator_13_5.py:269-295."""

    features: int
    m: int
    image_size: int
    use_noise: bool
    dead_bias: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        feas = []
        for i in range(self.m):
            f = sk.StyleConv13(self.features, 3 + 2 * i,
                               use_noise=self.use_noise, bn=True,
                               dead_bias=self.dead_bias, dtype=self.dtype,
                               name=f"conv_{i}")(
                x, sk.style_sub(w, f"conv_{i}"), train)
            f = core.PReLU(channels=self.features, dtype=self.dtype,
                           name=f"nonlinear_{i}")(f)
            feas.append(f)
        feas = jnp.stack(feas, axis=1)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        att = att_cls(self.m, style=sk.V13_5, dtype=self.dtype,
                      name="sk_attention")(feas, train)
        return sk.sk_fuse(feas, att)


class SKConvPlain(nn.Module):
    """Non-style SKConv (generator_13_5.py:173-202): m x [EqualizedConv
    (3+2i) + BN + PReLU], SK fusion."""

    features: int
    m: int
    image_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        feas = []
        for i in range(self.m):
            f = sk.EqualizedConvRep(self.features, 3 + 2 * i,
                                    dtype=self.dtype, name=f"conv_{i}")(x)
            f = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name=f"BatchNorm_{i}")(f)
            f = core.PReLU(channels=self.features, dtype=self.dtype,
                           name=f"nonlinear_{i}")(f)
            feas.append(f)
        feas = jnp.stack(feas, axis=1)
        att_cls = sk.SKAttentionConv if self.image_size > 4 else sk.SKAttentionFC
        att = att_cls(self.m, style=sk.V13_5, dtype=self.dtype,
                      name="sk_attention")(feas, train)
        return sk.sk_fuse(feas, att)


class StyleBlock(nn.Module):
    """generator_13_5.py:298-321: conv1 k1, noisy conv2/SKStyleConv, conv3
    fixed k3, NO final activation."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    image_size: int
    dead_bias: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        ip, od = self.in_planes, self.out_planes + self.dense_depth
        kw = dict(bn=True, dead_bias=self.dead_bias, dtype=self.dtype)
        x = sk.StyleConv13(ip, 1, **kw, name="conv1")(
            x, sk.style_sub(w, "conv1"), train)
        x = core.PReLU(channels=ip, dtype=self.dtype, name="activation1")(x)
        if self.m == 1:
            x = sk.StyleConv13(ip, self.kernel_size, use_noise=True, **kw,
                               name="conv2")(
                x, sk.style_sub(w, "conv2"), train)
            x = core.PReLU(channels=ip, dtype=self.dtype, name="activation2")(x)
        else:
            x = SKStyleConv(ip, self.m, self.image_size, use_noise=True,
                            dead_bias=self.dead_bias, dtype=self.dtype,
                            name="skconv")(x, sk.style_sub(w, "skconv"), train)
        x = sk.StyleConv13(od, 3, **kw, name="conv3")(
            x, sk.style_sub(w, "conv3"), train)
        return x


class ResnetInit(nn.Module):
    """generator_13_5.py:324-351: additive fusion + PReLU.

    TPU-first fusion: the reference's four StyleBlocks split into two
    groups of identical shape — {residual(x_res), transient_across(x_tra)}
    emitting out+dd and {residual_across(x_res), transient(x_tra)}
    emitting out. Three implementations, identical params (stacked (2,...)
    leaves) and math:
    - impl='vmap' (default — matches the persisted flagship compile
      cache; see Generator13_5.rir_impl): nn.vmap'd StyleBlock with
      stacked weights (half the HLO of unrolled; stacked (2, B, H, W, C)
      elementwise layout).
    - impl='folded': each group is ONE FoldedStyleBlockPair on
      channel-folded (B, H, W, 2C) tensors — grouped convs plus
      lane-aligned elementwise ops (models/paired.py rationale).
    - impl='unrolled': four separate StyleBlocks (different param tree;
      reference-shaped, kept for clarity/debugging).
    `fused=False` is honored as impl='unrolled' for backward compat."""

    in_planes: int
    out_planes: int
    dense_depth: int
    kernel_size: int
    m: int
    image_size: int
    dead_bias: bool = True
    fused: bool = True
    impl: str = "vmap"  # 'folded' | 'vmap' | 'unrolled'
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, xs, w, train: bool = True):
        x_res, x_tra = xs
        impl = self.impl if self.fused else "unrolled"
        kw = dict(in_planes=self.in_planes, out_planes=self.out_planes,
                  kernel_size=self.kernel_size, m=self.m,
                  image_size=self.image_size, dead_bias=self.dead_bias,
                  dtype=self.dtype)
        if impl == "folded":
            from gan_tpu.models import paired

            folded = paired.fold_pair(x_res, x_tra)
            ga = paired.FoldedStyleBlockPair(
                dense_depth=self.dense_depth, name="group_dd", **kw
            )(folded, sk.style_sub(w, "group_dd"), train)
            gb = paired.FoldedStyleBlockPair(
                dense_depth=0, name="group_nodd", **kw
            )(folded, sk.style_sub(w, "group_nodd"), train)
            r_r, t_r = paired.split_pair(
                ga, self.out_planes + self.dense_depth)
            r_t, t_t = paired.split_pair(gb, self.out_planes)
        elif impl == "vmap":
            # style-bank mode: the group's style subtree carries stacked
            # (2, B, c) leaves — map it alongside the (2, ...) feature pair
            w_axis = 0 if isinstance(w, dict) else None
            VBlock = nn.vmap(
                StyleBlock,
                in_axes=(0, w_axis, None),
                out_axes=0,
                variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True, "noise": True},
            )
            pair = jnp.stack([x_res, x_tra])
            ga = VBlock(dense_depth=self.dense_depth, name="group_dd", **kw)(
                pair, sk.style_sub(w, "group_dd"), train)
            gb = VBlock(dense_depth=0, name="group_nodd", **kw)(
                pair, sk.style_sub(w, "group_nodd"), train)
            r_r, t_r = ga[0], ga[1]
            r_t, t_t = gb[0], gb[1]
        else:
            r_r = StyleBlock(dense_depth=self.dense_depth, name="residual", **kw)(x_res, sk.style_sub(w, "residual"), train)
            r_t = StyleBlock(dense_depth=0, name="residual_across", **kw)(x_res, sk.style_sub(w, "residual_across"), train)
            t_t = StyleBlock(dense_depth=0, name="transient", **kw)(x_tra, sk.style_sub(w, "transient"), train)
            t_r = StyleBlock(dense_depth=self.dense_depth, name="transient_across", **kw)(x_tra, sk.style_sub(w, "transient_across"), train)
        od = self.out_planes + self.dense_depth
        res = core.PReLU(channels=od, dtype=self.dtype,
                         name="activation_residual")(r_r + t_r)
        tra = core.PReLU(channels=self.out_planes, dtype=self.dtype,
                         name="activation_transient")(r_t + t_t)
        return res, tra


class BasicBlock(nn.Module):
    """generator_13_5.py:408-467."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    m: int
    image_size: int
    root: bool = False
    is_unify: bool = False
    dead_bias: bool = True
    rir_impl: str = "vmap"
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        if self.is_unify or self.root:
            return 2 * self.out_planes + 2 * self.dense_depth
        return self.last_planes + self.dense_depth

    @nn.compact
    def __call__(self, x, w, train: bool = True):
        d = self.out_planes
        dd = self.dense_depth
        kw = dict(m=self.m, image_size=self.image_size,
                  dead_bias=self.dead_bias, dtype=self.dtype)
        if self.is_unify:
            x = StyleBlock(self.in_planes, 2 * d, dd, 3, name="unify", **kw)(
                x, sk.style_sub(w, "unify"), train)
            x = core.PReLU(channels=2 * d + dd, dtype=self.dtype,
                           name="activation_unify")(x)
        x_res = jnp.concatenate([x[..., :d], x[..., 2 * d:]], axis=-1)
        x_tra = x[..., d:]
        r3, t3 = ResnetInit(self.in_planes, d, dd, 3, impl=self.rir_impl,
                            name="rir_3", **kw)(
            (x_res, x_tra), sk.style_sub(w, "rir_3"), train)
        se_cls = sk.SEBlockConv if self.image_size > 4 else sk.SEBlockFC
        gate = se_cls(style=sk.V13_5, dtype=self.dtype,
                      name="se_attention_residual")(r3[..., :d], train)
        feas_res = x[..., :d] + r3[..., :d] * gate
        if self.root:
            sc = StyleBlock(self.in_planes, 0, dd, 3, name="shortcut", **kw)(
                x, sk.style_sub(w, "shortcut"), train)
            sc = core.PReLU(channels=dd, dtype=self.dtype,
                            name="activation_shortcut")(sc)
            return jnp.concatenate([feas_res, t3, sc, r3[..., d:]], axis=-1)
        return jnp.concatenate(
            [feas_res, t3, x[..., 2 * d:], r3[..., d:]], axis=-1
        )


class ToRGB(nn.Module):
    """Style-free ToRGB (generator_13_5.py:470-493): pre conv/SKConv with
    BN, EqualizedConv k5 to 3 channels, BatchNorm(3)."""

    m: int
    image_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        planes = x.shape[-1]
        if self.m == 1:
            x = sk.EqualizedConvRep(planes, 3, dtype=self.dtype,
                                    name="pre_conv")(x)
            x = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name="pre_bn")(x)
            x = core.PReLU(channels=planes, dtype=self.dtype,
                           name="pre_activation")(x)
        else:
            x = SKConvPlain(planes, self.m, self.image_size,
                            dtype=self.dtype, name="skconv")(x, train)
        x = sk.EqualizedConvRep(3, 5, dtype=self.dtype, name="conv")(x)
        return core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                              name="bn")(x)


class Tree(nn.Module):
    """generator_13_5.py:496-564: rgb = to_rgb(root_out) + rgb."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    m: int
    image_size: int
    dead_bias: bool = True
    rir_impl: str = "vmap"
    dtype: jnp.dtype = None

    def _block(self, last, root, unify, name):
        ip = self.in_planes * self.block_num if root else self.in_planes
        return BasicBlock(last, ip, self.out_planes, self.dense_depth,
                          self.m, self.image_size, root=root, is_unify=unify,
                          dead_bias=self.dead_bias, rir_impl=self.rir_impl,
                          dtype=self.dtype, name=name)

    def get_out_planes(self) -> int:
        return 2 * self.out_planes + 2 * self.dense_depth

    @nn.compact
    def __call__(self, x, w, rgb, train: bool = True):
        d = self.out_planes
        last = self.last_planes
        xs = []
        if self.level > 1:
            pr = self._block(last, False, last < 2 * d, "prev_root")
            xs.append(pr(x, sk.style_sub(w, "prev_root"), train))
            for i in reversed(range(1, self.level)):
                sub = Tree(last, self.in_planes, self.out_planes,
                           self.dense_depth, level=i,
                           block_num=self.block_num, m=self.m,
                           image_size=self.image_size,
                           dead_bias=self.dead_bias,
                           rir_impl=self.rir_impl, dtype=self.dtype,
                           name=f"level_{i}")
                x, rgb = sub(x, sk.style_sub(w, f"level_{i}"), rgb, train)
                last = sub.get_out_planes()
                xs.append(x)
            for i in range(self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, sk.style_sub(w, f"block_{i}"), train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        else:
            b0 = self._block(last, False, last < 2 * d, "block_0")
            x = b0(x, sk.style_sub(w, "block_0"), train)
            last = b0.get_out_planes()
            xs.append(x[..., : 2 * d])
            for i in range(1, self.block_num):
                b = self._block(last, False, False, f"block_{i}")
                x = b(x, sk.style_sub(w, f"block_{i}"), train)
                last = b.get_out_planes()
                xs.append(x[..., : 2 * d])
        xs.append(x[..., 2 * d:])
        cat = jnp.concatenate(xs, axis=-1)
        out = self._block(cat.shape[-1], True, False, "root")(
            cat, sk.style_sub(w, "root"), train)
        rgb_new = ToRGB(self.m, self.image_size, dtype=self.dtype,
                        name="to_rgb")(out, train)
        return out, rgb_new + rgb


class GeneratorBlock(nn.Module):
    """generator_13_5.py:567-583: BN-SKConvT upsampling of rgb + features,
    then the tree."""

    last_planes: int
    in_planes: int
    out_planes: int
    dense_depth: int
    level: int
    block_num: int
    m: int
    image_size: int
    dead_bias: bool = True
    rir_impl: str = "vmap"
    dtype: jnp.dtype = None

    def get_out_planes(self) -> int:
        return 2 * self.out_planes + 2 * self.dense_depth

    @nn.compact
    def __call__(self, x, w, rgb, train: bool = True):
        rgb = sk.SKConvT(style=sk.V13_5, dtype=self.dtype,
                         name="upsample_rgb")(rgb, train)
        x = sk.SKConvT(style=sk.V13_5, dtype=self.dtype, name="upsample")(x, train)
        return Tree(self.last_planes, self.in_planes, self.out_planes,
                    self.dense_depth, self.level, self.block_num, self.m,
                    self.image_size, dead_bias=self.dead_bias,
                    rir_impl=self.rir_impl, dtype=self.dtype,
                    name="tree")(x, sk.style_sub(w, "tree"), rgb, train)


class Generator13_5(nn.Module):
    """generator_13_5.py:586-631 (planes=48, mapping 12 layers)."""

    z_dim: int = 256
    planes: int = 48
    mapping_layers: int = 12
    fix_styleconv_bias: bool = False  # True repairs the dead-bias bug
    # ResnetInit pair layout (see models/paired.py). Default 'vmap': the
    # persisted compile cache holds the vmap flagship step programs (the
    # 284x bench, docs/STATUS.md); flip to 'folded' only together with a
    # re-prewarm (tools/prewarm_bench.py) — a cold flagship compile takes
    # tens of minutes on this host's remote compile service.
    rir_impl: str = "vmap"
    remat: bool = True  # block-level rematerialization: the full model's
    # activations (incl. the GP double-backward) exceed 16GB HBM otherwise
    # style_bank=True computes every to_style chain batched at the top
    # (models/style_bank.py) — CHANGES THE PARAM TREE; same re-prewarm
    # rule as rir_impl (convert checkpoints with style_bank.classic_to_bank)
    style_bank: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        p = self.planes
        dead = not self.fix_styleconv_bias
        w = sk.Mapping13(self.mapping_layers, bn=True, dtype=self.dtype,
                         name="mapping_network")(z, train)
        if self.style_bank:
            from gan_tpu.models import style_bank as sb

            w = sb.StyleBank13(sb.style_registry(self), dtype=self.dtype,
                               name="style_bank")(w, train)
        # GeneratorStart (generator_13_5.py:586-607)
        x = z.reshape(z.shape[0], 1, 1, -1)
        x = core.ConvTranspose(p * 8, 4, 1, 0, dtype=self.dtype,
                               name="start_convT")(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="start_bn")(x)
        x = core.PReLU(channels=p * 8, dtype=self.dtype,
                       name="start_activation")(x)
        rgb = ToRGB(1, 4, dtype=self.dtype, name="start_to_rgb")(x, train)
        # static_argnums index includes self at 0: train sits at 4 in
        # __call__(self, x, w, rgb, train)
        tree_cls = nn.remat(Tree, static_argnums=(4,)) if self.remat else Tree
        blk_cls = (nn.remat(GeneratorBlock, static_argnums=(4,))
                   if self.remat else GeneratorBlock)
        start_tree = tree_cls(p * 8, p * 8, p * 4, p // 8, level=1,
                              block_num=2, m=1, image_size=4, dead_bias=dead,
                              rir_impl=self.rir_impl, dtype=self.dtype,
                              name="start_tree")
        x, rgb = start_tree(x, sk.style_sub(w, "start_tree"), rgb, train)
        last = 2 * (p * 4) + 2 * (p // 8)

        stages = [
            (p * 4, p * 4, 8),
            (p * 2, p * 2, 16),
            (p * 1, p * 1, 32),
            (p * 1, p * 1, 64),
        ]
        for i, (ip, op, size) in enumerate(stages):
            blk = blk_cls(last, ip, op, p // 8, level=2, block_num=2,
                          m=2, image_size=size, dead_bias=dead,
                          rir_impl=self.rir_impl, dtype=self.dtype,
                          name=f"block{i + 1}")
            x, rgb = blk(x, sk.style_sub(w, f"block{i + 1}"), rgb, train)
            last = 2 * op + 2 * (p // 8)
        return rgb
