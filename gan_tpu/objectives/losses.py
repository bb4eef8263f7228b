"""Base GAN losses with reference-parity label recipes.

BCE with noisy labels: real target = 0.95 + 0.05*U(0,1), fake target =
0.05*U(0,1) (/root/reference/train/gan.py:27-41); torch BCELoss clamps the
log terms at -100, reproduced here for value parity.

Wasserstein: D maximizes mean(D(real)) - mean(D(fake)); G minimizes
-mean(D(fake)) (/root/reference/train/wgangp.py:20-33).
"""

import jax
import jax.numpy as jnp


def bce(pred, target):
    """torch.nn.BCELoss(reduction='mean') parity: expects pred in (0,1),
    clamps log terms at -100."""
    log_p = jnp.clip(jnp.log(pred), -100.0, None)
    log_1p = jnp.clip(jnp.log(1.0 - pred), -100.0, None)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def noisy_valid_labels(rng, batch: int):
    """real target = 0.95 + 0.05*U(0,1)  (gan.py:27-28)."""
    return 0.95 + 0.05 * jax.random.uniform(rng, (batch, 1))


def noisy_fake_labels(rng, batch: int):
    """fake target = 0 + 0.05*U(0,1)  (gan.py:39-41)."""
    return 0.05 * jax.random.uniform(rng, (batch, 1))


def d_real_loss_bce(rng, pred_r):
    return bce(pred_r, noisy_valid_labels(rng, pred_r.shape[0]))


def d_fake_loss_bce(rng, pred_f):
    return bce(pred_f, noisy_fake_labels(rng, pred_f.shape[0]))


def g_loss_bce(rng, pred_f):
    """G trained toward the smoothed 'valid' label (gan.py:32)."""
    return bce(pred_f, noisy_valid_labels(rng, pred_f.shape[0]))


def d_real_loss_wass(pred_r):
    return -jnp.mean(pred_r)


def d_fake_loss_wass(pred_f):
    return jnp.mean(pred_f)


def g_loss_wass(pred_f):
    return -jnp.mean(pred_f)
