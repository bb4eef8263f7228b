"""One full wganlazygpR2 G+D train step on the THESIS PAIR vs torch
(VERDICT r2 #2, second half).

Reference math mirrored exactly (/root/reference/train/wganlazygpR2.py:
26-77, penalty step idx%5==0):
  real_loss = -mean(D(x));      r1 = 5 * mean(grad2(D, x_real))
  fake_loss = +mean(D(G(z)));   r2 = 5 * mean(grad2(D, gen))
  gp = 10 * 5 * mean((sqrt(grad2(D, (1-eps)x + eps g)) - 1)^2)
  g_loss = -mean(D(G(z')))
then one TTUR Adam step each (trainunits.py:18-19).

Sides: torch reference G13_5(z=32, planes=8) + full D9_4 (f=64, the class
hardcodes it) with weights imported into the rebuild via the
name-directed G13 translator + the windowed importer. StyleConv noise
scales zeroed on both sides (the only cross-framework RNG); their own
grads (<noise, dL/dx>, framework-random by construction) are excluded
from comparison. BN in train mode with exact two-pass variance on the
flax side (core.exact_batchnorm_variance — torch computes variance
exactly; see core.py).

Usage: python tools/g135_step_parity.py   (re-execs to a scrubbed
clean-CPU process; eager execution, no jit compiles)
Writes docs/evidence/g135_step_parity.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from g135_parity import load_ref_g135, reexec_scrubbed  # noqa: E402


def _load_ref(rel):
    import importlib.util
    import types

    sys.path.insert(0, "/root/reference")
    if "torchsummary" not in sys.modules:
        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_" + rel.replace("/", "_"), os.path.join("/root/reference", rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    if (os.environ.get("G135_PARITY_INNER") != "1"
            and (os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
                 or "axon" in os.environ.get("JAX_PLATFORMS", ""))):
        reexec_scrubbed()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax
    import torch

    from gan_tpu.models import core
    from gan_tpu.models.generators.g13_5 import Generator13_5
    from gan_tpu.models.discriminators import Discriminator9_4
    from gan_tpu.io.torch_import import import_state_dict
    from gan_tpu.io.torch_import_g13 import import_g13_5

    t0 = time.time()
    B, Z, PLANES = 4, 32, 8

    torch.manual_seed(0)
    ref_g = load_ref_g135()
    tg = ref_g.Generator(z_dim=Z, planes=PLANES)
    td = _load_ref("discriminators/discriminator_9_4.py").Discriminator()
    tg.train()
    td.train()
    print(f"# torch pair built ({time.time() - t0:.0f}s)")

    g = Generator13_5(z_dim=Z, planes=PLANES, remat=False)
    d = Discriminator9_4(remat=False)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    # keep the RAW init dicts: tree_map rebuilds dicts in sorted key
    # order, destroying the call-order walk the windowed importer needs
    gv = dict(g.init(rngs, jnp.zeros((B, Z)), train=True))
    dv = dict(d.init(rngs, jnp.zeros((B, 64, 64, 3)), train=True,
                     update_sn=False))
    print(f"# flax pair init ({time.time() - t0:.0f}s)")

    gv = import_g13_5(gv, tg.state_dict())
    dv = import_state_dict(
        dv, td.state_dict(),
        flatten_hints={"fc1/weight": (2, 2, 1025)},
        name_hints={"down_conv": "down_sample", "/se/": r"\.se\."})
    print(f"# import done ({time.time() - t0:.0f}s)")

    def zero_noise(tree):
        return {
            k: (np.zeros_like(x) if k == "scale_noise" else x)
            if not hasattr(x, "items") else zero_noise(x)
            for k, x in tree.items()
        }

    gv["params"] = zero_noise(gv["params"])
    with torch.no_grad():
        for n, p in tg.named_parameters():
            if n.endswith("scale_noise"):
                p.zero_()

    rng = np.random.default_rng(11)
    x_real = rng.normal(size=(B, 64, 64, 3)).astype(np.float32)
    z_d = rng.normal(size=(B, Z)).astype(np.float32)
    z_g = rng.normal(size=(B, Z)).astype(np.float32)
    eps = rng.uniform(size=(B, 1, 1, 1)).astype(np.float32)

    def _nchw(a):
        return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))

    # ---------------- torch side: reference separate backwards ----------
    def t_grad2(d_out, x_in):
        gr = torch.autograd.grad(d_out.sum(), x_in, create_graph=True,
                                 retain_graph=True)[0]
        return gr.pow(2).flatten(1).sum(1)

    with torch.no_grad():
        t_gen = tg(torch.from_numpy(z_d).reshape(B, Z, 1, 1))
    t_gen.requires_grad_()
    t_xr = _nchw(x_real).requires_grad_()
    td.zero_grad()
    pred_r = td(t_xr)
    t_real = -pred_r.mean()
    t_real.backward(retain_graph=True)
    t_r1 = 5 * t_grad2(pred_r, t_xr).mean()
    t_r1.backward()
    pred_f = td(t_gen)
    t_fake = pred_f.mean()
    t_fake.backward(retain_graph=True)
    t_r2 = 5 * t_grad2(pred_f, t_gen).mean()
    t_r2.backward()
    te = torch.from_numpy(eps.transpose(0, 3, 1, 2))
    x_hat = ((1 - te) * _nchw(x_real) + te * t_gen.detach()).requires_grad_()
    pred_h = td(x_hat)
    t_gp = 10 * 5 * ((t_grad2(pred_h, x_hat).sqrt() - 1.0) ** 2).mean()
    t_gp.backward()
    t_dgrads = {n: (p.grad if p.grad is not None
                    else torch.zeros_like(p)).detach().clone()
                for n, p in td.named_parameters()}
    print(f"# torch D step done ({time.time() - t0:.0f}s)")

    tg.zero_grad()
    td.zero_grad()
    t_gloss = -td(tg(torch.from_numpy(z_g).reshape(B, Z, 1, 1))).mean()
    t_gloss.backward()
    # dead StyleConv biases get no torch grad (the reference bug); flax
    # carries explicit zeros for them — fill zeros for the comparison
    t_ggrads = {n: (p.grad if p.grad is not None
                    else torch.zeros_like(p)).detach().clone()
                for n, p in tg.named_parameters()}
    print(f"# torch G step done ({time.time() - t0:.0f}s)")

    # ---------------- flax side: summed loss, jax.grad ------------------
    def d_apply(p, x):
        # D9_4 carries only 'params' (no BN/SN state collections)
        return d.apply({"params": p}, x, train=True, update_sn=False)

    def g_apply(p, z):
        return g.apply({"params": p, "batch_stats": gv["batch_stats"]},
                       jnp.asarray(z), train=True,
                       rngs={"noise": jax.random.PRNGKey(2)},
                       mutable=["batch_stats"])[0]

    with core.exact_batchnorm_variance():
        f_gen = jax.lax.stop_gradient(g_apply(gv["params"], z_d))

        def d_loss(p):
            def f(xx):
                return d_apply(p, xx)

            pred_r = f(jnp.asarray(x_real))
            real = -jnp.mean(pred_r)
            g2r = jnp.sum(jnp.square(
                jax.grad(lambda xx: jnp.sum(f(xx)))(jnp.asarray(x_real))
                .reshape(B, -1)), axis=1)
            r1 = 5 * jnp.mean(g2r)
            pred_f = f(f_gen)
            fake = jnp.mean(pred_f)
            g2f = jnp.sum(jnp.square(
                jax.grad(lambda xx: jnp.sum(f(xx)))(f_gen)
                .reshape(B, -1)), axis=1)
            r2 = 5 * jnp.mean(g2f)
            xh = (1 - jnp.asarray(eps)) * jnp.asarray(x_real) \
                + jnp.asarray(eps) * f_gen
            g2h = jnp.sum(jnp.square(
                jax.grad(lambda xx: jnp.sum(f(xx)))(xh)
                .reshape(B, -1)), axis=1)
            gp = 10 * 5 * jnp.mean(jnp.square(jnp.sqrt(g2h) - 1.0))
            return real + fake + r1 + r2 + gp, (real, fake, r1, r2, gp)

        (dl, (f_real, f_fake, f_r1, f_r2, f_gp)), f_dgrads = \
            jax.value_and_grad(d_loss, has_aux=True)(dv["params"])
        print(f"# flax D step done ({time.time() - t0:.0f}s)")

        def g_loss(p):
            return -jnp.mean(d_apply(dv["params"], g_apply(p, z_g)))

        f_gl, f_ggrads = jax.value_and_grad(g_loss)(gv["params"])
        print(f"# flax G step done ({time.time() - t0:.0f}s)")

    # ---------------- compare scalars -----------------------------------
    scalars = {}
    for name, a, b in [("real_loss", f_real, t_real), ("fake_loss", f_fake, t_fake),
                       ("r1", f_r1, t_r1), ("r2", f_r2, t_r2),
                       ("gp", f_gp, t_gp), ("g_loss", f_gl, t_gloss)]:
        fa, tb = float(a), float(b)
        rel = abs(fa - tb) / max(abs(tb), 1e-8)
        scalars[name] = {"flax": fa, "torch": tb, "rel": rel}
        print(f"# {name}: flax {fa:+.6f} torch {tb:+.6f} rel {rel:.2e}")
        assert rel < 5e-3, f"{name} diverged"

    # ---------------- compare grads (importer-transformed) --------------
    def max_rel(flax_tree, torch_grads, import_fn, template, scale_ref):
        # scale_noise grads map through (keeps the importers' exhaustive
        # consumption checks) but are skipped in the comparison below:
        # they are <noise, dL/dx> with framework-local noise draws
        mapped = import_fn({"params": template}, dict(torch_grads))
        worst = 0.0
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(flax_tree),
                jax.tree_util.tree_leaves_with_path(mapped["params"])):
            if "scale_noise" in str(pa):
                continue
            err = np.abs(np.asarray(a) - np.asarray(b)).max()
            worst = max(worst, err / scale_ref)
        return worst

    # reference scale: the largest torch grad magnitude
    d_scale = max(float(v.abs().max()) for v in t_dgrads.values())
    g_scale = max(float(v.abs().max()) for v in t_ggrads.values())

    def import_d(vars_, sd):
        return import_state_dict(
            vars_, sd, flatten_hints={"fc1/weight": (2, 2, 1025)},
            name_hints={"down_conv": "down_sample", "/se/": r"\.se\."})

    def import_g(vars_, sd):
        # grads carry no running stats; template is params-only
        return import_g13_5(vars_, sd)

    # templates passed RAW (dict order = call order; see init note above)
    dg_rel = max_rel(f_dgrads, t_dgrads, import_d, dv["params"], d_scale)
    print(f"# D grad max rel-to-peak err: {dg_rel:.2e} "
          f"(peak |grad| {d_scale:.3e})")
    gg_rel = max_rel(f_ggrads, t_ggrads, import_g, gv["params"], g_scale)
    print(f"# G grad max rel-to-peak err: {gg_rel:.2e} "
          f"(peak |grad| {g_scale:.3e})")
    assert dg_rel < 1e-2 and gg_rel < 1e-2

    out = {"batch": B, "z_dim": Z, "planes": PLANES,
           "d9_4": "full (f=64)", "scalars": scalars,
           "d_grad_max_rel_to_peak": float(dg_rel),
           "g_grad_max_rel_to_peak": float(gg_rel), "status": "PASS"}
    with open("docs/evidence/g135_step_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"status": "PASS", "d_grad_rel": float(dg_rel),
                      "g_grad_rel": float(gg_rel)}))


if __name__ == "__main__":
    main()
