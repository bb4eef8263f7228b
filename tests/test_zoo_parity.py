"""Full-zoo parameter-count parity vs the PyTorch reference.

Expected counts measured from /root/reference with tools/param_parity.py
(trainable parameters only; the reference's frozen Smooth blur kernels are
constants here). eval_shape only — no compilation, runs in seconds.
"""

import jax
import jax.numpy as jnp
import pytest

from gan_tpu.models import build_generator, build_discriminator
from gan_tpu.utils import param_count

GENERATOR_COUNTS = {
    "G1": 6_501_120,
    "G2": 52_448_768,
    "G3_progan": 52_452_622,
    "G4": 7_929_571,
    "G5": 25_572_459,
    "G6": 1_213_974,
    "G7": 27_101_512,
    "G8": 66_194_894,
    "G9": 40_990_957,
    "G10": 27_213_362,
    "G10_2": 8_168_907,
    "G11": 23_550_282,
    "G12": 75_759_561,
    "G13": 632_970_343,
    "G13_2": 632_970_343,
    "G13_5": 362_387_184,
    "G13_1": 359_381_606,
    "G13_3": 39_780_772,
    "G13_4": 291_817_368,
    "G14": 15_186_083,
}

DISCRIMINATOR_COUNTS = {
    "D1": 3_162_497,
    "D2": 2_765_568,
    "D3_wgangp": 11_032_580,
    "D3_wgangpsn": 2_763_776,
    "D3_wgangp_progan": 11_280_524,
    "D4": 1_365_053,
    "D5": 26_118_657,
    "D5_wgangp": 25_338_113,
    "D5_wgangpsn": 26_103_041,
    "D6_wgangp": 713_884,
    "D7_wgangp": 2_747_849,
    "D7_wgangpsn": 14_406_889,
    "D8": 9_850_319,
    "D9": 138_139_632,
    "D9_2": 8_678_736,
    "D9_3": 25_589_239,
    "D9_4": 152_712_132,
    "D9_small": 24_309_999,
}

RNGS = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}


@pytest.mark.parametrize("name", sorted(GENERATOR_COUNTS))
def test_generator_zoo_parity(name):
    m = build_generator(name, z_dim=256)
    v = jax.eval_shape(lambda: m.init(RNGS, jnp.zeros((4, 256)), train=True))
    assert param_count(dict(v)["params"]) == GENERATOR_COUNTS[name]


@pytest.mark.parametrize("name", sorted(DISCRIMINATOR_COUNTS))
def test_discriminator_zoo_parity(name):
    m = build_discriminator(name)
    v = jax.eval_shape(
        lambda: m.init(RNGS, jnp.zeros((4, 64, 64, 3)), train=True,
                       update_sn=False)
    )
    assert param_count(dict(v)["params"]) == DISCRIMINATOR_COUNTS[name]


@pytest.mark.parametrize("name", ["G13_3", "G14"])
def test_new_generator_output_shapes(name):
    """Forward-shape smoke for SK-family reps (eval_shape, no compile)."""
    m = build_generator(name, z_dim=32)
    out = jax.eval_shape(
        lambda: m.init_with_output(RNGS, jnp.zeros((4, 32)), train=True)
    )[0]
    assert out.shape == (4, 64, 64, 3)


@pytest.mark.parametrize("name", ["D9_4", "D9_small", "D8", "D6_wgangp"])
def test_new_discriminator_output_shapes(name):
    m = build_discriminator(name)
    out = jax.eval_shape(
        lambda: m.init_with_output(RNGS, jnp.zeros((4, 64, 64, 3)),
                                   train=True, update_sn=False)
    )[0]
    assert out.shape == (4, 1)