"""Analytic correctness of losses and grad-of-grad penalties."""

import jax
import jax.numpy as jnp
import numpy as np

from gan_tpu.objectives import losses as L
from gan_tpu.objectives import penalties as P


def test_bce_matches_formula():
    pred = jnp.array([[0.9], [0.1]])
    target = jnp.array([[1.0], [0.0]])
    expected = -(np.log(0.9) + np.log(0.9)) / 2
    np.testing.assert_allclose(L.bce(pred, target), expected, rtol=1e-6)


def test_bce_clamps_at_neg100():
    pred = jnp.array([[0.0]])
    target = jnp.array([[1.0]])
    assert float(L.bce(pred, target)) == 100.0


def test_label_noise_ranges():
    rng = jax.random.PRNGKey(0)
    v = L.noisy_valid_labels(rng, 1000)
    f = L.noisy_fake_labels(rng, 1000)
    assert 0.95 <= float(v.min()) and float(v.max()) <= 1.0
    assert 0.0 <= float(f.min()) and float(f.max()) <= 0.05


def test_grad2_linear_critic():
    """D(x) = <w, x>: per-sample ||dD/dx||^2 == ||w||^2 exactly."""
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3))

    def d_apply(x):
        return jnp.sum(x * w, axis=(1, 2, 3), keepdims=False)[:, None]

    x = jax.random.normal(jax.random.PRNGKey(2), (5, 4, 4, 3))
    pred, g2 = P.pred_and_grad2(d_apply, x)
    np.testing.assert_allclose(pred, jnp.sum(x * w, axis=(1, 2, 3))[:, None], rtol=1e-5)
    np.testing.assert_allclose(g2, jnp.full((5,), jnp.sum(w**2)), rtol=1e-5)


def test_gradient_penalty_linear_critic():
    """For linear D, penalty == (||w|| - 1)^2 regardless of interpolation."""
    w = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 3))

    def d_apply(x):
        return jnp.sum(x * w, axis=(1, 2, 3))[:, None]

    real = jax.random.normal(jax.random.PRNGKey(2), (6, 4, 4, 3))
    fake = jax.random.normal(jax.random.PRNGKey(3), (6, 4, 4, 3))
    gp = P.gradient_penalty(d_apply, jax.random.PRNGKey(4), real, fake)
    expected = (np.sqrt(float(jnp.sum(w**2))) - 1.0) ** 2
    np.testing.assert_allclose(gp, expected, rtol=1e-5)


def test_grad_of_grad_through_params():
    """d/dw of the R1 penalty for D(x)=<w,x> is 2w — checks second order."""
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 2, 2, 1))

    def loss(w):
        def d_apply(x_):
            return jnp.sum(x_ * w, axis=(1, 2, 3))[:, None]

        return jnp.mean(P.grad2(d_apply, x))

    w0 = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 1))
    g = jax.grad(loss)(w0)
    np.testing.assert_allclose(g, 2 * w0, rtol=1e-5)
