"""D4 — ShuffleNet/DenseNet hybrid discriminator (sigmoid head).

Reference: /root/reference/discriminators/discriminator_4.py
- BasicModel (:30-88): preact BN+LReLU, 3x3/5x5/7x7 conv, b2 residual branch
  + b3 dense branch, each SE-gated on its pooled output.
- DenseBlock (:90-136): 4-way split; blocks on quarters 2/3/4, 1x1 densecut;
  concat + shuffle(4). Output planes + 16.
- DownBlock (:138-170): dual-branch stride-2 (3x3->1x1 and 1x1->3x3),
  concat + shuffle(2).
- Discriminator (:192-232): stem 3->16->36, four Block stages (3 DenseBlocks
  + DownBlock) 36->40->48->64->80, 4x4 head conv to 128, Linear 128->1,
  sigmoid.
"""

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import core


class BasicModel4(nn.Module):
    planes: int
    dense_depth: int
    kernel_size: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        p, dd, k = self.planes, self.dense_depth, self.kernel_size
        pad = (k - 1) // 2
        out = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        out = core.leaky_relu(out, 0.2)
        out = core.Conv(p, k, 1, pad, use_bias=False, dtype=self.dtype)(out)

        def branch(feats, name):
            b = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name=f"{name}_bn")(out)
            b = core.leaky_relu(b, 0.2)
            return core.Conv(feats, k, 1, pad, use_bias=False,
                             dtype=self.dtype, name=f"{name}_conv")(b)

        out_b2 = branch(p, "b2")
        out_b3 = branch(dd, "b3")

        def se(v, feats, name):
            w = core.global_avg_pool(v)
            w = core.Conv(feats // 4, 1, dtype=self.dtype, name=f"{name}_c1")(w)
            w = core.leaky_relu(w, 0.2)
            w = core.Conv(feats, 1, dtype=self.dtype, name=f"{name}_c2")(w)
            return nn.sigmoid(w)

        out_b2 = out_b2 * se(out_b2, p, "se_1")
        out_b3 = out_b3 * se(out_b3, dd, "se_2")
        out_b2 = out_b2 + x
        return jnp.concatenate([out_b2, out_b3], axis=-1)


class DenseBlock4(nn.Module):
    last_planes: int
    dense_depth: int = 16
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        lp = self.last_planes
        # reference split ratios: int(C*0.5) twice (discriminator_4.py:115-118)
        c1 = int(lp * 0.5)
        x1, x2 = x[..., :c1], x[..., c1:]
        c11 = int(x1.shape[-1] * 0.5)
        x1_1, x1_2 = x1[..., :c11], x1[..., c11:]
        c21 = int(x2.shape[-1] * 0.5)
        x2_1, x2_2 = x2[..., :c21], x2[..., c21:]

        d = lp // 4
        out_12 = BasicModel4(d, self.dense_depth, 3, dtype=self.dtype,
                             name="b3x3")(x1_2, train)
        out_21 = BasicModel4(d, self.dense_depth, 5, dtype=self.dtype,
                             name="b5x5")(x2_1, train)
        out_22 = BasicModel4(d, self.dense_depth, 7, dtype=self.dtype,
                             name="b7x7")(x2_2, train)

        dc = core.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            name="densecut_bn")(x)
        dc = core.leaky_relu(dc, 0.2)
        dc = core.Conv(self.dense_depth, 1, 1, 0, use_bias=False,
                       dtype=self.dtype, name="densecut_conv")(dc)

        out = jnp.concatenate(
            [out_12[..., :d], out_21[..., :d], out_22[..., :d], x1_1,
             dc + out_12[..., d:] + out_21[..., d:] + out_22[..., d:]],
            axis=-1,
        )
        return core.channel_shuffle(out, 4)


class DownBlock4(nn.Module):
    out_channels: int
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.out_channels // 2
        in_ch = x.shape[-1]

        def bn_act(v, name):
            v = core.BatchNorm(use_running_average=not train,
                               dtype=self.dtype, name=name)(v)
            return core.leaky_relu(v, 0.2)

        b1 = bn_act(x, "b1_bn1")
        b1 = core.Conv(in_ch, 3, 2, 1, use_bias=False, dtype=self.dtype,
                       name="b1_conv1")(b1)
        b1 = bn_act(b1, "b1_bn2")
        b1 = core.Conv(mid, 1, 1, 0, use_bias=False, dtype=self.dtype,
                       name="b1_conv2")(b1)

        b2 = bn_act(x, "b2_bn1")
        b2 = core.Conv(mid, 1, 1, 0, use_bias=False, dtype=self.dtype,
                       name="b2_conv1")(b2)
        b2 = bn_act(b2, "b2_bn2")
        b2 = core.Conv(mid, 3, 2, 1, use_bias=False, dtype=self.dtype,
                       name="b2_conv2")(b2)

        out = jnp.concatenate([b1, b2], axis=-1)
        return core.channel_shuffle(out, 2)


class Discriminator4(nn.Module):
    net_size: int = 1
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x, train: bool = True, update_sn: bool = True):
        x = core.Conv(16, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(36, 3, 1, 1, use_bias=False, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)

        for stage, out_p in enumerate((40, 48, 64, 80)):
            planes = x.shape[-1]
            for b in range(3):
                x = DenseBlock4(planes, 16, dtype=self.dtype,
                                name=f"stage{stage}_dense{b}")(x, train)
                planes += 16
            x = DownBlock4(out_p, dtype=self.dtype,
                           name=f"stage{stage}_down")(x, train)

        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = core.Conv(128, 4, 1, 0, use_bias=False, dtype=self.dtype)(x)
        x = core.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = core.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = core.Linear(1, dtype=self.dtype)(x)
        return jax.nn.sigmoid(x)
