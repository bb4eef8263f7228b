"""Shape + parameter-count parity for the early zoo (vs counts measured from
the PyTorch reference, SURVEY.md SS2.5)."""

import jax
import jax.numpy as jnp
import pytest

from gan_tpu.models import build_generator, build_discriminator
from gan_tpu.utils import param_count

RNG = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


def _g_params(model, z_dim, batch=2):
    v = model.init(RNG, jnp.zeros((batch, z_dim)), train=True)
    return dict(v)["params"]


def _d_params(model, batch=4):
    v = model.init(RNG, jnp.zeros((batch, 64, 64, 3)), train=True, update_sn=False)
    return dict(v)["params"]


@pytest.mark.parametrize(
    "name,kwargs,z,expected",
    [
        ("G1", dict(z_dim=256), 256, 6_501_120),
        ("G2", dict(z_dim=256, ngf=256), 256, 52_448_768),
    ],
)
def test_generator_param_parity(name, kwargs, z, expected):
    g = build_generator(name, **kwargs)
    assert param_count(_g_params(g, z)) == expected


@pytest.mark.parametrize(
    "name,kwargs,expected",
    [
        ("D1", {}, 3_162_497),
        ("D2", dict(ndf=64), 2_765_568),
        ("D3_wgangp", dict(ndf=128), 11_032_580),
    ],
)
def test_discriminator_param_parity(name, kwargs, expected):
    d = build_discriminator(name, **kwargs)
    assert param_count(_d_params(d)) == expected


@pytest.mark.parametrize("name,kwargs", [
    ("G1", dict(z_dim=64)),
    ("G2", dict(z_dim=64, ngf=8)),
    ("G3_progan", dict(z_dim=64, ngf=8)),
])
def test_generator_output_shape(name, kwargs):
    g = build_generator(name, **kwargs)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    y = g.init_with_output(RNG, z, train=True)[0]
    if isinstance(y, tuple):
        y = y[0]
    assert y.shape == (2, 64, 64, 3)
    assert bool(jnp.isfinite(y).all())


@pytest.mark.parametrize("name,kwargs", [
    ("D1", {}),
    ("D2", dict(ndf=8)),
    ("D3_wgangp", dict(ndf=8)),
    ("D3_wgangpsn", dict(ndf=8)),
    ("D3_wgangp_progan", dict(ndf=8)),
])
def test_discriminator_output_shape(name, kwargs):
    d = build_discriminator(name, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 64, 64, 3))
    y = d.init_with_output(RNG, x, train=True, update_sn=False)[0]
    if isinstance(y, tuple):
        y = y[0]
    assert y.shape == (4, 1)
    assert bool(jnp.isfinite(y).all())
