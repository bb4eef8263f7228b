"""Golden-value parity vs PyTorch on identical weights (SURVEY.md SS4
implications 2-3): forwards, BCE loss, and the grad-of-grad penalties must
match the torch reference semantics numerically.

Uses MLP models (G1/D1) where weight transport torch<->flax is exact
(Linear kernel = W.T)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gan_tpu.models.generators import Generator1
from gan_tpu.models.discriminators import Discriminator1
from gan_tpu.objectives import losses as L
from gan_tpu.objectives import penalties as P


def _torch_d1():
    m = torch.nn.Sequential(
        torch.nn.Flatten(),
        torch.nn.Linear(64 * 64 * 3, 256), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(256, 64), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(64, 1), torch.nn.Sigmoid(),
    )
    return m


def _sync_d1(flax_params, tm):
    """Copy torch Linear weights into the flax D1 param tree."""
    layers = [m for m in tm if isinstance(m, torch.nn.Linear)]
    names = sorted(k for k in flax_params if k.startswith("Linear_"))
    out = dict(flax_params)
    for name, lin in zip(names, layers):
        out[name] = {
            "Dense_0": {
                "kernel": jnp.asarray(lin.weight.detach().numpy().T),
                "bias": jnp.asarray(lin.bias.detach().numpy()),
            }
        }
    return out


@pytest.fixture(scope="module")
def d1_pair():
    tm = _torch_d1()
    d = Discriminator1()
    variables = d.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((2, 64, 64, 3)), train=True)
    params = _sync_d1(dict(variables)["params"], tm)
    return tm, d, params


def test_d1_forward_parity(d1_pair):
    tm, d, params = d1_pair
    x = np.random.default_rng(0).normal(size=(4, 64, 64, 3)).astype(np.float32)
    ours = d.apply({"params": params}, jnp.asarray(x), train=True)
    # torch is NCHW; D1 flattens — match the flatten ORDER by permuting
    xt = torch.from_numpy(x)  # keep NHWC flatten order on both sides
    theirs = tm(xt).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-5, atol=2e-6)


def test_bce_loss_parity(d1_pair):
    tm, d, params = d1_pair
    x = np.random.default_rng(1).normal(size=(4, 64, 64, 3)).astype(np.float32)
    target = np.random.default_rng(2).uniform(0.95, 1.0, (4, 1)).astype(np.float32)
    ours = L.bce(d.apply({"params": params}, jnp.asarray(x), train=True),
                 jnp.asarray(target))
    crit = torch.nn.BCELoss()
    theirs = crit(tm(torch.from_numpy(x)), torch.from_numpy(target))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


def test_grad2_penalty_parity(d1_pair):
    """compute_grad2 (wgangp.py:44-54) vs our pred_and_grad2: per-sample
    ||dD/dx||^2 must match."""
    tm, d, params = d1_pair
    x = np.random.default_rng(3).normal(size=(4, 64, 64, 3)).astype(np.float32)

    _, g2_ours = P.pred_and_grad2(
        lambda v: d.apply({"params": params}, v, train=True), jnp.asarray(x)
    )

    xt = torch.from_numpy(x).requires_grad_()
    pred = tm(xt)
    grad = torch.autograd.grad(pred.sum(), xt, create_graph=True)[0]
    g2_theirs = grad.pow(2).reshape(4, -1).sum(1).detach().numpy()
    np.testing.assert_allclose(np.asarray(g2_ours), g2_theirs, rtol=2e-4)


def test_second_order_grad_parity(d1_pair):
    """d(mean R1)/d(first-layer weight): the double-backward path."""
    tm, d, params = d1_pair
    x = np.random.default_rng(4).normal(size=(4, 64, 64, 3)).astype(np.float32)

    def loss_ours(p):
        g2 = P.grad2(lambda v: d.apply({"params": p}, v, train=True),
                     jnp.asarray(x))
        return jnp.mean(g2)

    grads = jax.grad(loss_ours)(params)
    g_ours = np.asarray(grads["Linear_0"]["Dense_0"]["kernel"])

    xt = torch.from_numpy(x).requires_grad_()
    pred = tm(xt)
    grad = torch.autograd.grad(pred.sum(), xt, create_graph=True)[0]
    reg = grad.pow(2).reshape(4, -1).sum(1).mean()
    reg.backward()
    lin0 = [m for m in tm if isinstance(m, torch.nn.Linear)][0]
    g_theirs = lin0.weight.grad.detach().numpy().T
    np.testing.assert_allclose(g_ours, g_theirs, rtol=3e-3, atol=1e-6)


def test_wgan_losses_match_reference_signs():
    pred_r = jnp.asarray([[1.0], [2.0]])
    pred_f = jnp.asarray([[3.0], [5.0]])
    assert float(L.d_real_loss_wass(pred_r)) == -1.5
    assert float(L.d_fake_loss_wass(pred_f)) == 4.0
    assert float(L.g_loss_wass(pred_f)) == -4.0
