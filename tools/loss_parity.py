"""Loss-curve parity harness: torch reference vs gan_tpu on the smoke
config (BASELINE acceptance: curves matching within tolerance).

Runs the reference G1+D1 BCE-GAN loop (train/gan.py semantics) and our
`gan` objective from IDENTICAL initial weights (exact transport — MLPs)
on the SAME synthetic dataset, then compares smoothed loss curves. RNG
streams differ by framework, so the comparison is distributional: windowed
means must agree within tolerance.

Usage: python tools/loss_parity.py [steps] [batch]
Writes loss_parity.json and loss_parity.png.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(steps=1000, batch=64, nz=64, tol=0.35):
    import torch

    import jax
    import jax.numpy as jnp
    from gan_tpu.models.generators import Generator1
    from gan_tpu.models.discriminators import Discriminator1
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step

    rng_np = np.random.default_rng(0)
    data = rng_np.normal(size=(steps, batch, 64, 64, 3)).astype(np.float32)

    # ---- torch side (reference gan.py semantics) ----
    tg = torch.nn.Sequential(
        torch.nn.Linear(nz, 256), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(256, 512), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(512, 64 * 64 * 3), torch.nn.Tanh(),
    )
    td = torch.nn.Sequential(
        torch.nn.Linear(64 * 64 * 3, 256), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(256, 64), torch.nn.LeakyReLU(0.2),
        torch.nn.Linear(64, 1), torch.nn.Sigmoid(),
    )
    optG = torch.optim.Adam(tg.parameters(), lr=1e-4, betas=(0.5, 0.99))
    optD = torch.optim.Adam(td.parameters(), lr=4e-4, betas=(0.0, 0.99))
    crit = torch.nn.BCELoss()

    # ---- ours, with transported initial weights ----
    g = Generator1(z_dim=nz)
    d = Discriminator1()
    obj = get_objective("gan")
    gtx, dtx = obj.make_optimizers()
    state = create_state(jax.random.PRNGKey(0), g, d, gtx, dtx,
                         batch_size=batch)

    def t2f(params, torch_mod):
        lins = [m for m in torch_mod if isinstance(m, torch.nn.Linear)]
        names = sorted(k for k in params if k.startswith("Linear_"))
        out = dict(params)
        for name, lin in zip(names, lins):
            out[name] = {"Dense_0": {
                "kernel": jnp.asarray(lin.weight.detach().numpy().T),
                "bias": jnp.asarray(lin.bias.detach().numpy()),
            }}
        return out

    g_params = t2f(state.g_params, tg)
    d_params = t2f(state.d_params, td)
    opt_init = jax.jit(lambda gp, dp: (gtx.init(gp), dtx.init(dp)))
    g_opt, d_opt = opt_init(g_params, d_params)
    state = state.replace(g_params=g_params, d_params=d_params,
                          g_opt=g_opt, d_opt=d_opt)
    step = build_train_step(g, d, obj, gtx, dtx, jit=True)

    torch_g, torch_d, ours_g, ours_d = [], [], [], []
    key = jax.random.PRNGKey(7)
    for i in range(steps):
        x_np = data[i]
        # torch step (gan.py:24-52)
        xt = torch.from_numpy(x_np.reshape(batch, -1))
        valid = 0.95 + 0.05 * torch.rand(batch, 1)
        fake_t = 0.05 * torch.rand(batch, 1)
        optD.zero_grad()
        with torch.no_grad():
            gi = tg(torch.randn(batch, nz))
        rl = crit(td(xt), valid)
        rl.backward()
        fl = crit(td(gi), fake_t)
        fl.backward()
        optD.step()
        optG.zero_grad()
        valid = 0.95 + 0.05 * torch.rand(batch, 1)
        gl = crit(td(tg(torch.randn(batch, nz))), valid)
        gl.backward()
        optG.step()
        torch_d.append(float(rl + fl))
        torch_g.append(float(gl))

        key, sk = jax.random.split(key)
        state, m = step(state, jnp.asarray(x_np), sk, i)
        ours_d.append(float(m["real_loss"] + m["fake_loss"]))
        ours_g.append(float(m["g_loss"]))

    def smooth(v, w=50):
        v = np.asarray(v)
        return np.convolve(v, np.ones(w) / w, mode="valid")

    sg_t, sg_o = smooth(torch_g), smooth(ours_g)
    sd_t, sd_o = smooth(torch_d), smooth(ours_d)
    g_gap = float(np.max(np.abs(sg_t - sg_o)))
    d_gap = float(np.max(np.abs(sd_t - sd_o)))
    result = {
        "steps": steps,
        "g_loss_max_windowed_gap": g_gap,
        "d_loss_max_windowed_gap": d_gap,
        "tolerance": tol,
        "pass": bool(g_gap < tol and d_gap < tol),
        "torch_g_final": float(sg_t[-1]), "ours_g_final": float(sg_o[-1]),
        "torch_d_final": float(sd_t[-1]), "ours_d_final": float(sd_o[-1]),
    }
    with open("loss_parity.json", "w") as f:
        json.dump(result, f, indent=1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    axes[0].plot(sg_t, label="torch G"); axes[0].plot(sg_o, label="ours G")
    axes[0].legend(); axes[0].set_title("generator loss (smoothed)")
    axes[1].plot(sd_t, label="torch D"); axes[1].plot(sd_o, label="ours D")
    axes[1].legend(); axes[1].set_title("discriminator loss (smoothed)")
    fig.savefig("loss_parity.png", dpi=120)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    run(*(int(a) for a in sys.argv[1:]))