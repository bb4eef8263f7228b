"""Unit tests for core NHWC primitives (shape + init + math parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gan_tpu.models import core


RNG = jax.random.PRNGKey(0)


def test_conv_shapes_torch_semantics():
    x = jnp.ones((2, 64, 64, 3))
    # torch Conv2d(3, 8, 4, 2, 1) -> 32x32
    m = core.Conv(8, 4, 2, 1)
    y, _ = m.init_with_output(RNG, x)
    assert y.shape == (2, 32, 32, 8)
    # torch Conv2d(3, 8, 3, 1, 1) -> same spatial
    m = core.Conv(8, 3, 1, 1)
    y, _ = m.init_with_output(RNG, x)
    assert y.shape == (2, 64, 64, 8)
    # head conv 4,1,0 on 4x4 -> 1x1
    m = core.Conv(1, 4, 1, 0)
    y, _ = m.init_with_output(RNG, jnp.ones((2, 4, 4, 8)))
    assert y.shape == (2, 1, 1, 1)


def test_conv_transpose_shapes_torch_semantics():
    # torch ConvTranspose2d(nz, f, 4, 1, 0): 1x1 -> 4x4
    y, _ = core.ConvTranspose(8, 4, 1, 0).init_with_output(RNG, jnp.ones((2, 1, 1, 16)))
    assert y.shape == (2, 4, 4, 8)
    # torch ConvTranspose2d(f, f, 4, 2, 1): doubles
    y, _ = core.ConvTranspose(8, 4, 2, 1).init_with_output(RNG, jnp.ones((2, 8, 8, 16)))
    assert y.shape == (2, 16, 16, 8)


def test_torch_default_init_bounds():
    # kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))
    m = core.Conv(64, 3, 1, 1)
    v = m.init(RNG, jnp.ones((1, 8, 8, 16)))
    k = v["params"]["Conv_0"]["kernel"]
    bound = 1.0 / np.sqrt(16 * 9)
    assert float(jnp.abs(k).max()) <= bound + 1e-6
    assert float(jnp.abs(k).max()) >= bound * 0.9  # actually fills the range


def test_prelu():
    m = core.PReLU()
    y, v = m.init_with_output(RNG, jnp.array([-2.0, 3.0]))
    np.testing.assert_allclose(y, [-0.5, 3.0], atol=1e-6)  # slope 0.25


def test_equalized_conv_scale_and_init():
    x = jax.random.normal(RNG, (4, 8, 8, 32))
    m = core.EqualizedConv(16, 3, 1, 1)
    y, v = m.init_with_output(RNG, x)
    assert y.shape == (4, 8, 8, 16)
    k = v["params"]["Conv_0"]["Conv_0"]["kernel"]
    # weights ~ N(0,1) — std close to 1
    assert 0.9 < float(jnp.std(k)) < 1.1
    # output magnitude reflects the sqrt(2/fan_in) runtime scale:
    # var(y) ~ 2 for unit-normal input/weights
    assert 1.0 < float(jnp.var(y)) < 4.0


def test_pixnorm():
    x = jax.random.normal(RNG, (2, 4, 4, 8))
    y, _ = core.PixNorm().init_with_output(RNG, x)
    norms = jnp.mean(jnp.square(y), axis=-1)
    np.testing.assert_allclose(norms, jnp.ones_like(norms), atol=1e-3)


def test_progan_stddev():
    x = jax.random.normal(RNG, (8, 4, 4, 16))
    y = core.progan_stddev(x)
    assert y.shape == (8, 4, 4, 17)
    # appended channel is constant across batch & space
    assert float(jnp.std(y[..., -1])) < 1e-6


def test_minibatch_stddev():
    x = jax.random.normal(RNG, (8, 4, 4, 16))
    y = core.minibatch_stddev(x, group_size=4)
    assert y.shape == (8, 4, 4, 17)
    assert float(jnp.std(y[..., -1])) < 1e-6
    with pytest.raises(AssertionError):
        core.minibatch_stddev(x[:6], group_size=4)


def test_spectral_norm_unit_sigma():
    """After normalization, the kernel's top singular value is ~1."""
    x = jnp.ones((2, 8, 8, 4))
    m = core.SNConv(8, 3, 1, 1)
    vars0 = m.init(RNG, x, update_stats=False)

    # run several power iterations by repeated application
    v = vars0
    for _ in range(20):
        _, mut = m.apply(v, x, update_stats=True, mutable=["spectral"])
        v = {**v, **mut}

    kernel = v["params"]["kernel"]
    sn = core.SpectralNorm()
    u = v["spectral"]["sn"]["u"]
    norm_kernel = sn.apply({"spectral": {"u": u}}, kernel, False)
    w = np.asarray(norm_kernel.reshape(-1, kernel.shape[-1]).T)
    sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(sigma - 1.0) < 1e-3


def test_smooth_preserves_constant():
    x = jnp.full((1, 8, 8, 3), 5.0)
    y = core.smooth(x)
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_resample_shapes():
    x = jax.random.normal(RNG, (2, 8, 8, 4))
    assert core.upsample_smooth(x).shape == (2, 16, 16, 4)
    assert core.downsample_smooth(x).shape == (2, 4, 4, 4)
