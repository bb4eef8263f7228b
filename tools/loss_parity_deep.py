"""Deep-pair loss-trajectory parity: reference G2+D3_wgangp under WGAN-GP
(/root/reference/train/wgangp.py semantics) vs our `wgangp` objective, from
IDENTICAL initial weights (exact transport via gan_tpu.io.torch_import).

Complements tools/loss_parity.py (1k-step MLP smoke pair): this proves the
trajectory-level agreement on a deep CONV pair with the grad-of-grad
penalty in the loop. RNG streams differ by framework, so the comparison is
distributional: windowed means must agree within tolerance.

Usage: python tools/loss_parity_deep.py [steps] [batch]
Writes loss_parity_deep.json and loss_parity_deep.png.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(steps=200, batch=16, nz=64, tol=0.15):
    import importlib.util

    import torch

    import jax
    import jax.numpy as jnp
    from gan_tpu.io.torch_import import import_state_dict, _ensure_reference_importable
    from gan_tpu.models.generators import Generator2
    from gan_tpu.models.discriminators import Discriminator3WGANGP
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step

    _ensure_reference_importable()

    def load_ref(rel, name):
        spec = importlib.util.spec_from_file_location(
            name, f"/root/reference/{rel}")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    tg = load_ref("generators/generator_2.py", "lpd_g2").Generator(
        1, nz=nz, ngf=32, nc=3)
    td = load_ref("discriminators/discriminator_3_wgangp.py",
                  "lpd_d3").Discriminator(1, ndf=32, nc=3)
    tg.train(), td.train()

    rng_np = np.random.default_rng(0)
    data = rng_np.normal(size=(min(steps, 64), batch, 64, 64, 3)).astype(np.float32)

    # reference wgangp.py optimizers: AdamW(0.5, 0.999) override (:17-18)
    optG = torch.optim.AdamW(tg.parameters(), lr=1e-4, betas=(0.5, 0.999))
    optD = torch.optim.AdamW(td.parameters(), lr=4e-4, betas=(0.5, 0.999))

    g = Generator2(z_dim=nz, ngf=32, nc=3)
    d = Discriminator3WGANGP(ndf=32, nc=3)
    obj = get_objective("wgangp")
    gtx, dtx = obj.make_optimizers()
    state = create_state(jax.random.PRNGKey(0), g, d, gtx, dtx,
                         batch_size=batch)
    g_vars = import_state_dict(
        {"params": jax.tree_util.tree_map(np.asarray, state.g_params),
         **{k: jax.tree_util.tree_map(np.asarray, v)
            for k, v in state.g_state.items()}},
        tg.state_dict())
    d_vars = import_state_dict(
        {"params": jax.tree_util.tree_map(np.asarray, state.d_params)},
        td.state_dict())
    g_params = jax.tree_util.tree_map(jnp.asarray, g_vars["params"])
    d_params = jax.tree_util.tree_map(jnp.asarray, d_vars["params"])
    g_state = {k: jax.tree_util.tree_map(jnp.asarray, v)
               for k, v in g_vars.items() if k != "params"}
    opt_init = jax.jit(lambda gp, dp: (gtx.init(gp), dtx.init(dp)))
    g_opt, d_opt = opt_init(g_params, d_params)
    state = state.replace(g_params=g_params, d_params=d_params,
                          g_state=g_state, g_opt=g_opt, d_opt=d_opt)
    step = build_train_step(g, d, obj, gtx, dtx, jit=True)

    def torch_step(x_np):
        """wgangp.py:29-71 D step + :20-27 G step."""
        xt = torch.from_numpy(np.ascontiguousarray(
            x_np.transpose(0, 3, 1, 2)))
        optD.zero_grad()
        with torch.no_grad():
            gi = tg(torch.randn(batch, nz, 1, 1))
        gi.requires_grad_()
        pred_r = td(xt)
        real_loss = -pred_r.mean()
        real_loss.backward()
        pred_f = td(gi)
        fake_loss = pred_f.mean()
        fake_loss.backward()
        epsv = torch.rand(batch, 1, 1, 1)
        x_hat = ((1 - epsv) * xt + epsv * gi).detach().requires_grad_()
        ph = td(x_hat)
        gr = torch.autograd.grad(ph.sum(), x_hat, create_graph=True)[0]
        gp = 10.0 * ((gr.pow(2).flatten(1).sum(1).sqrt() - 1) ** 2).mean()
        gp.backward()
        optD.step()
        optG.zero_grad()
        gl = -td(tg(torch.randn(batch, nz, 1, 1))).mean()
        gl.backward()
        optG.step()
        return float(real_loss + fake_loss), float(gl)

    torch_d, torch_g, ours_d, ours_g = [], [], [], []
    key = jax.random.PRNGKey(7)
    for i in range(steps):
        x_np = data[i % len(data)]
        t_d, t_g = torch_step(x_np)
        torch_d.append(t_d), torch_g.append(t_g)
        key, sk = jax.random.split(key)
        state, m = step(state, jnp.asarray(x_np), sk, i)
        ours_d.append(float(m["real_loss"] + m["fake_loss"]))
        ours_g.append(float(m["g_loss"]))

    def smooth(v, w=40):
        v = np.asarray(v)
        w = min(w, len(v))
        return np.convolve(v, np.ones(w) / w, mode="valid")

    sg_t, sg_o = smooth(torch_g), smooth(ours_g)
    sd_t, sd_o = smooth(torch_d), smooth(ours_d)
    # RELATIVE windowed gap: unlike the BCE smoke pair (losses O(1)), the
    # WGAN critic on a noise corpus has no equilibrium — both trajectories
    # dive to O(100) magnitudes, so the meaningful criterion is that the
    # curves track each other relative to their scale.
    def rel_gap(a, b):
        scale = np.maximum(np.abs((a + b) / 2.0), 1.0)
        return float(np.max(np.abs(a - b) / scale))

    g_gap = rel_gap(sg_t, sg_o)
    d_gap = rel_gap(sd_t, sd_o)
    result = {
        "pair": "G2(ngf=32)+D3_wgangp(ndf=32)",
        "objective": "wgangp",
        "steps": steps,
        "g_loss_max_windowed_rel_gap": g_gap,
        "d_loss_max_windowed_rel_gap": d_gap,
        "tolerance": tol,
        "pass": bool(g_gap < tol and d_gap < tol),
        "torch_g_final": float(sg_t[-1]), "ours_g_final": float(sg_o[-1]),
        "torch_d_final": float(sd_t[-1]), "ours_d_final": float(sd_o[-1]),
    }
    with open("loss_parity_deep.json", "w") as f:
        json.dump(result, f, indent=1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    axes[0].plot(sg_t, label="torch G"); axes[0].plot(sg_o, label="ours G")
    axes[0].legend(); axes[0].set_title("G loss (smoothed), G2+D3 wgangp")
    axes[1].plot(sd_t, label="torch D"); axes[1].plot(sd_o, label="ours D")
    axes[1].legend(); axes[1].set_title("D loss (smoothed)")
    fig.savefig("loss_parity_deep.png", dpi=120)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    run(*(int(a) for a in sys.argv[1:]))
