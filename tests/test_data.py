"""Data pipeline tests: native loader parity, datasets, augmentation."""

import numpy as np
import pytest

from gan_tpu.data import ImageFolderDataset, SyntheticDataset, DataLoader
from gan_tpu.data import augment, native


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(10):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"{i}.png")
    return str(d)


def test_native_loader_available():
    assert native.available(), "C++ loader failed to build"


def test_native_decode_matches_pil_exact_size(image_dir):
    ds_native = ImageFolderDataset(image_dir, use_native=True)
    ds_pil = ImageFolderDataset(image_dir, use_native=False)
    # at load size == stored size no resize happens: decode must be bitexact
    np.testing.assert_array_equal(ds_native.images, ds_pil.images)


def test_native_gather():
    src = np.random.default_rng(1).integers(0, 256, (50, 4, 4, 3), np.uint8)
    idx = np.array([3, 1, 4, 1, 5], np.int64)
    np.testing.assert_array_equal(native.gather(src, idx), src[idx])


def test_dataloader_epoch(image_dir):
    ds = ImageFolderDataset(image_dir)
    loader = DataLoader(ds, batch_size=4, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # drop_last: 10 // 4
    assert batches[0].shape == (4, 64, 64, 3)
    assert str(batches[0].dtype) == "uint8"


def test_preprocess_batch_reference_semantics():
    import jax
    import jax.numpy as jnp

    raw = jnp.asarray(
        np.random.default_rng(2).integers(0, 256, (4, 64, 64, 3), np.uint8)
    )
    out = augment.preprocess_batch(jax.random.PRNGKey(0), raw)
    assert out.shape == (4, 64, 64, 3)
    assert out.dtype == jnp.float32
    # normalize(x/255) with ImageNet stats: channel 0 range is
    # (0-.485)/.229 .. (1-.485)/.229
    assert float(out[..., 0].min()) >= (0 - 0.485) / 0.229 - 1e-4
    assert float(out[..., 0].max()) <= (1 - 0.485) / 0.229 + 1e-4
    # round trip
    x01 = augment.denormalize(out)
    assert float(x01.min()) >= -1e-4 and float(x01.max()) <= 1 + 1e-4


def test_mixup_shapes():
    import jax

    rng = jax.random.PRNGKey(0)
    a = jax.numpy.ones((6, 8, 8, 3))
    b = jax.numpy.zeros((6, 8, 8, 3))
    mixed, label, lam = augment.mixup(rng, a, b, alpha=1.0)
    assert mixed.shape == a.shape and label.shape == (6, 1)
    np.testing.assert_allclose(float(mixed[0, 0, 0, 0]), float(lam), rtol=1e-6)
    mixed, label = augment.mixup_wgan(rng, a, b, alpha=1.0)
    assert mixed.shape == a.shape and label.shape == (6, 1)
    np.testing.assert_allclose(
        np.asarray(mixed[:, 0, 0, 0]), np.asarray(label[:, 0]), rtol=1e-6
    )

# ---------------------------------------------------------------------------
# MNIST (reference units/dataloader.py:16-27 parity — local IDX files)


def _write_idx_images(path, arr):
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 3))
        f.write(struct.pack(">3I", *arr.shape))
        f.write(arr.tobytes())


def _write_idx_labels(path, arr):
    import struct

    with open(path, "wb") as f:
        f.write(struct.pack(">HBB", 0, 0x08, 1))
        f.write(struct.pack(">I", arr.shape[0]))
        f.write(arr.tobytes())


@pytest.fixture(scope="module")
def mnist_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mnist")
    raw = d / "MNIST" / "raw"  # torchvision layout
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (12, 28, 28), dtype=np.uint8)
    lbls = rng.integers(0, 10, (12,), dtype=np.uint8)
    _write_idx_images(raw / "train-images-idx3-ubyte", imgs)
    _write_idx_labels(raw / "train-labels-idx1-ubyte", lbls)
    return str(d), imgs, lbls


def test_mnist_idx_reader(mnist_dir):
    from gan_tpu.data.datasets import MNISTDataset

    root, imgs, lbls = mnist_dir
    ds = MNISTDataset(root)
    assert ds.images.shape == (12, 28, 28, 1)
    np.testing.assert_array_equal(ds.images[..., 0], imgs)
    np.testing.assert_array_equal(ds.labels, lbls)
    # reference get_MNIST semantics: 0.5-normalize, no flip, 1 channel
    assert ds.mean == (0.5,) and ds.std == (0.5,) and not ds.flip
    assert ds.channels == 1


def test_mnist_idx_reader_gz(mnist_dir, tmp_path):
    import gzip

    from gan_tpu.data.datasets import MNISTDataset

    root, imgs, _ = mnist_dir
    src = f"{root}/MNIST/raw/train-images-idx3-ubyte"
    with open(src, "rb") as f:
        blob = f.read()
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(blob)
    ds = MNISTDataset(str(tmp_path))
    np.testing.assert_array_equal(ds.images[..., 0], imgs)


def test_mnist_preprocess_pipeline(mnist_dir):
    """uint8 (B,28,28,1) -> bicubic 64x64, (x-0.5)/0.5 in [-1,1]."""
    import jax

    from gan_tpu.data.datasets import MNISTDataset

    root, _, _ = mnist_dir
    ds = MNISTDataset(root)
    loader = DataLoader(ds, batch_size=4, seed=0)
    raw = next(iter(loader))
    assert raw.shape == (4, 28, 28, 1)
    out = augment.preprocess_batch(
        jax.random.PRNGKey(0), raw, out_size=(64, 64),
        mean=np.asarray(ds.mean, np.float32),
        std=np.asarray(ds.std, np.float32), flip=ds.flip)
    assert out.shape == (4, 64, 64, 1)
    # bicubic overshoots beyond the [-1, 1] data range; the torch-parity
    # a=-0.75 kernel (core.resize_bicubic, no antialias) rings slightly
    # harder than jax.image's a=-0.5 (measured -1.311 on this fixture)
    assert float(out.min()) >= -1.35 and float(out.max()) <= 1.35
