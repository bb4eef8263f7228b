"""On-device (jitted) augmentation ops.

The reference's input transform chain (/root/reference/units/dataloader.py:
7-12) is ToTensor (/255) -> RandomHorizontalFlip -> bicubic Resize(size) ->
Normalize(ImageNet mean/std), run per-sample on the host by torchvision.
Here the whole chain is a single vectorized jax function that fuses into the
train step: the host ships raw uint8 NHWC batches; decode-to-float, flip,
resize, and normalize all run on the VPU. Mixup (/root/reference/units/
mixup.py:9-27 — dead code upstream but a named rebuild target) is provided
as on-device ops too.
"""

from typing import Tuple

import jax
import jax.numpy as jnp

# ImageNet statistics used by the reference (dataloader.py:11)
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def normalize(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    return (x - mean.astype(x.dtype)) / std.astype(x.dtype)


def denormalize(x: jax.Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jax.Array:
    return x * std.astype(x.dtype) + mean.astype(x.dtype)


def random_hflip(rng: jax.Array, x: jax.Array, p: float = 0.5) -> jax.Array:
    """Per-sample random horizontal flip of an NHWC batch."""
    flip = jax.random.bernoulli(rng, p, (x.shape[0], 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def preprocess_batch(
    rng: jax.Array,
    raw_uint8: jax.Array,
    out_size: Tuple[int, int] = (64, 64),
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    flip: bool = True,
) -> jax.Array:
    """uint8 NHWC -> normalized float32 NHWC, reference transform order."""
    x = raw_uint8.astype(jnp.float32) / 255.0
    if flip:
        x = random_hflip(rng, x)
    if (x.shape[1], x.shape[2]) != tuple(out_size):
        # torch-parity bicubic (a=-0.75, no antialias) — jax.image.resize
        # uses the Keys a=-0.5 kernel with antialiasing, which deviates
        # from the reference transform (ADVICE r2). Note torchvision
        # Resize WOULD antialias on downsample; every reference dataset
        # upsamples or is already at size (MNIST 28->64, cats 64->64), so
        # the upsample kernel is the parity-relevant one.
        from gan_tpu.models.core import resize_bicubic

        x = resize_bicubic(x, out_size)
    return normalize(x, mean, std)


def mixup(rng: jax.Array, true: jax.Array, fake: jax.Array, alpha: float):
    """Scalar-lambda mixup (/root/reference/units/mixup.py:9-17)."""
    b = true.shape[0]
    if alpha > 0:
        lam = jax.random.beta(rng, alpha, alpha)
    else:
        lam = jnp.float32(1.0)
    label = jnp.full((b, 1), lam, true.dtype)
    mixed = lam * true + (1.0 - lam) * fake
    return mixed, label, lam


def mixup_wgan(rng: jax.Array, true: jax.Array, fake: jax.Array, alpha: float):
    """Per-sample Beta lambda vector as soft labels
    (/root/reference/units/mixup.py:19-27)."""
    b = true.shape[0]
    if alpha > 0:
        label = jax.random.beta(rng, alpha, alpha, (b, 1))
    else:
        label = jnp.ones((b, 1), true.dtype)
    lam = label[:, :, None, None]
    mixed = lam * true + (1.0 - lam) * fake
    return mixed, label
