"""Gradient penalties via grad-of-grad under jit.

The reference computes these with torch.autograd.grad(create_graph=True)
(/root/reference/train/wgangp.py:44-54). Here each penalty is an ordinary
jax.grad w.r.t. the *input*, taken inside the discriminator loss function,
so differentiating the loss w.r.t. d_params gives the second-order term —
XLA handles grad-of-grad natively (SURVEY.md SS7 hard part 2).
"""

from typing import Callable

import jax
import jax.numpy as jnp


def pred_and_grad2(d_apply: Callable, x: jax.Array):
    """One forward + one input-backward: returns (pred, per-sample ||dD/dx||^2).

    Mirrors compute_grad2 (/root/reference/train/wgangp.py:44-54): grad of
    sum(D(x)) w.r.t. x, squared, summed per sample. The same forward's pred
    is reused for the main loss, like the reference's pred_r/pred_f reuse.
    """

    def f(x_):
        pred = d_apply(x_)
        return jnp.sum(pred), pred

    grads, pred = jax.grad(f, has_aux=True)(x)
    g2 = jnp.sum(jnp.square(grads).reshape(x.shape[0], -1), axis=1)
    return pred, g2


def grad2(d_apply: Callable, x: jax.Array) -> jax.Array:
    """Per-sample squared input-gradient norm of D at x (R1/R2 core)."""
    _, g2 = pred_and_grad2(d_apply, x)
    return g2


def gradient_penalty(
    d_apply: Callable,
    rng: jax.Array,
    x_real: jax.Array,
    x_fake: jax.Array,
    center: float = 1.0,
) -> jax.Array:
    """WGAN-GP penalty (/root/reference/train/wgangp.py:34-43):
    eps ~ U(0,1) per sample; x_hat = (1-eps)*real + eps*fake (note the
    reference orientation: eps weights the FAKE sample); penalty =
    mean((||dD/dx_hat|| - center)^2).
    """
    b = x_real.shape[0]
    eps = jax.random.uniform(rng, (b, 1, 1, 1), dtype=x_real.dtype)
    x_interp = (1.0 - eps) * x_real + eps * x_fake
    x_interp = jax.lax.stop_gradient(x_interp)
    g2 = grad2(d_apply, x_interp)
    return jnp.mean(jnp.square(jnp.sqrt(g2) - center))
