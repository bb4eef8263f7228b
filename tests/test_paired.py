"""Folded-channel ResnetInit (models/paired.py) vs the nn.vmap reference
implementation: identical parameter trees, identical math.

The 'noise' stream differs by construction (one folded draw vs two
per-stream draws), so parity runs with the scale_noise leaves zeroed —
every other op must then agree to fp-reassociation tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flax.traverse_util import flatten_dict, unflatten_dict

from gan_tpu.models.generators.g13_5 import ResnetInit


def _zero_noise(params):
    flat = flatten_dict(params)
    out = {k: (jnp.zeros_like(v) if k[-1] == "scale_noise" else v)
           for k, v in flat.items()}
    return unflatten_dict(out)


def _randomize(variables, rng):
    """Random params (init fns are partly constant-init; randomize to make
    the parity check non-trivial)."""
    flat = flatten_dict(variables)
    keys = jax.random.split(rng, len(flat))
    out = {}
    for (k, v), kk in zip(sorted(flat.items()), keys):
        if k[-1] in ("mean",):
            out[k] = jax.random.normal(kk, v.shape) * 0.05
        elif k[-1] in ("var",):
            out[k] = 1.0 + jax.random.uniform(kk, v.shape) * 0.1
        else:
            out[k] = jax.random.normal(kk, v.shape) * 0.5
    return unflatten_dict(out)


@pytest.mark.parametrize("m,image_size", [(2, 16), (1, 8)])
def test_folded_matches_vmap(m, image_size):
    B, ip, d, dd = 3, 8, 8, 2
    in_ch = 2 * d + dd  # unify-shaped input: x_res/x_tra get d + dd + ...
    rng = jax.random.PRNGKey(0)
    x_res = jax.random.normal(rng, (B, image_size, image_size, d + dd))
    x_tra = jax.random.normal(jax.random.PRNGKey(1),
                              (B, image_size, image_size, d + dd))
    w = jax.random.normal(jax.random.PRNGKey(2), (B, 32))

    kw = dict(in_planes=ip, out_planes=d, dense_depth=dd, kernel_size=3,
              m=m, image_size=image_size)
    mod_v = ResnetInit(impl="vmap", **kw)
    mod_f = ResnetInit(impl="folded", **kw)
    rngs = {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)}
    var_v = mod_v.init(rngs, (x_res, x_tra), w, train=True)
    var_f = mod_f.init(rngs, (x_res, x_tra), w, train=True)

    # identical trees: same names, shapes, dtypes
    fv = flatten_dict(var_v)
    ff = flatten_dict(var_f)
    assert set(fv) == set(ff), (
        f"only in vmap: {sorted(set(fv) - set(ff))[:4]} ... "
        f"only in folded: {sorted(set(ff) - set(fv))[:4]}"
    )
    for k in fv:
        assert fv[k].shape == ff[k].shape, (k, fv[k].shape, ff[k].shape)

    # same randomized params for both; noise zeroed for determinism
    var = _randomize(var_v, jax.random.PRNGKey(5))
    var = {"params": _zero_noise(var["params"]),
           "batch_stats": var["batch_stats"]}

    def run(mod):
        (res, tra), mut = mod.apply(
            var, (x_res, x_tra), w, train=True,
            rngs={"noise": jax.random.PRNGKey(9)},
            mutable=["batch_stats"],
        )
        return res, tra, mut["batch_stats"]

    res_v, tra_v, bs_v = run(mod_v)
    res_f, tra_f, bs_f = run(mod_f)

    np.testing.assert_allclose(np.asarray(res_f), np.asarray(res_v),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(tra_f), np.asarray(tra_v),
                               rtol=5e-4, atol=5e-5)
    # batch_stats updates agree leaf by leaf
    fbv = flatten_dict(bs_v)
    fbf = flatten_dict(bs_f)
    assert set(fbv) == set(fbf)
    for k in fbv:
        np.testing.assert_allclose(np.asarray(fbf[k]), np.asarray(fbv[k]),
                                   rtol=5e-4, atol=5e-5, err_msg=str(k))


def test_folded_eval_mode_matches():
    """Running-stat (train=False) path parity."""
    B, ip, d, dd, size = 2, 8, 8, 2, 8
    x_res = jax.random.normal(jax.random.PRNGKey(0), (B, size, size, d + dd))
    x_tra = jax.random.normal(jax.random.PRNGKey(1), (B, size, size, d + dd))
    w = jax.random.normal(jax.random.PRNGKey(2), (B, 16))
    kw = dict(in_planes=ip, out_planes=d, dense_depth=dd, kernel_size=3,
              m=2, image_size=size)
    mod_v = ResnetInit(impl="vmap", **kw)
    mod_f = ResnetInit(impl="folded", **kw)
    rngs = {"params": jax.random.PRNGKey(3), "noise": jax.random.PRNGKey(4)}
    var = mod_v.init(rngs, (x_res, x_tra), w, train=True)
    var = _randomize(var, jax.random.PRNGKey(5))
    var = {"params": _zero_noise(var["params"]),
           "batch_stats": var["batch_stats"]}

    def run(mod):
        return mod.apply(var, (x_res, x_tra), w, train=False,
                         rngs={"noise": jax.random.PRNGKey(9)})

    res_v, tra_v = run(mod_v)
    res_f, tra_f = run(mod_f)
    np.testing.assert_allclose(np.asarray(res_f), np.asarray(res_v),
                               rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(tra_f), np.asarray(tra_v),
                               rtol=5e-4, atol=5e-5)
