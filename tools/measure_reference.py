"""Measure the PyTorch reference implementation's training throughput on
this host, producing BENCH_BASELINE.json for bench.py's vs_baseline ratio.

The reference publishes no throughput numbers (BASELINE.md), so the
baseline is measured: its models are imported read-only from
/root/reference and driven by a freshly written step loop with the
wganlazygpR2 semantics (train/wganlazygpR2.py:48-77 + generator step):
D update (real/fake Wasserstein losses; R1, R2 and GP each x5 on the
idx%5==0 cadence) then G update, Adam TTUR (trainunits.py:18-19).

Throughput accounts for the lazy cadence analytically:
    t_step = (t_with_penalties + 4 * t_without) / 5
so only a few steps of each variant are needed (the flagship pair takes
minutes per penalty step on CPU).

Usage:
    python tools/measure_reference.py            # fallback pair (G2+D3)
    python tools/measure_reference.py flagship   # G13_5+D9_4
    python tools/measure_reference.py both
"""

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def load_ref_module(relpath: str, name: str):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "torchsummary" not in sys.modules:
        import types

        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _grad2(pred, x):
    """Sum-of-squares input gradient (reference compute_grad2,
    train/wganlazygpR2.py:39-46)."""
    import torch

    (grad,) = torch.autograd.grad(
        pred.sum(), x, create_graph=True, retain_graph=True
    )
    return grad.reshape(grad.shape[0], -1).pow(2).sum(1)


def _gp(d, real, fake):
    """Gradient penalty (train/wganlazygpR2.py:26-35)."""
    import torch

    eps = torch.rand(real.shape[0], 1, 1, 1)
    xhat = ((1 - eps) * real + eps * fake).detach().requires_grad_(True)
    pred = d(xhat)
    (grad,) = torch.autograd.grad(pred.sum(), xhat, create_graph=True)
    norm = grad.reshape(grad.shape[0], -1).pow(2).sum(1).sqrt()
    return ((norm - 1) ** 2).mean()


def measure_pair(g, d, nz: int, batch: int, steps_pen: int = 2,
                 steps_nopen: int = 3):
    import torch

    opt_g = torch.optim.Adam(g.parameters(), lr=1e-4, betas=(0.5, 0.99))
    opt_d = torch.optim.Adam(d.parameters(), lr=4e-4, betas=(0.0, 0.99))

    def d_step(images, penalties: bool):
        z = torch.randn(batch, nz, 1, 1)
        with torch.no_grad():
            fake = g(z)
        fake.requires_grad_(True)
        opt_d.zero_grad()
        images = images.requires_grad_(True)
        pred_r = d(images)
        real_loss = -pred_r.mean()
        if penalties:
            real_loss.backward(retain_graph=True)
            (5.0 * _grad2(pred_r, images).mean()).backward()
        else:
            real_loss.backward()
        pred_f = d(fake)
        fake_loss = pred_f.mean()
        if penalties:
            fake_loss.backward(retain_graph=True)
            (5.0 * _grad2(pred_f, fake).mean()).backward()
            (10.0 * _gp(d, images, fake) * 5.0).backward()
        else:
            fake_loss.backward()
        opt_d.step()

    def g_step():
        opt_g.zero_grad()
        z = torch.randn(batch, nz, 1, 1)
        (-d(g(z)).mean()).backward()
        opt_g.step()

    def timed(penalties: bool, n: int) -> float:
        images = torch.randn(batch, 3, 64, 64)
        # one untimed warmup step (allocator, autograd graph caches)
        d_step(images, penalties)
        g_step()
        t0 = time.perf_counter()
        for _ in range(n):
            d_step(images, penalties)
            g_step()
        return (time.perf_counter() - t0) / n

    t_pen = timed(True, steps_pen)
    t_nopen = timed(False, steps_nopen)
    t_step = (t_pen + 4.0 * t_nopen) / 5.0
    return {
        "sec_per_step_with_penalties": round(t_pen, 4),
        "sec_per_step_without": round(t_nopen, 4),
        "images_per_sec": round(batch / t_step, 4),
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "pair"
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BASELINE.json")
    blob = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            blob = json.load(f)

    if which in ("pair", "both"):
        gmod = load_ref_module("generators/generator_2.py", "ref_g2")
        dmod = load_ref_module("discriminators/discriminator_3_wgangp.py",
                               "ref_d3")
        res = measure_pair(gmod.Generator(ngpu=1, nz=256, ngf=256, nc=3),
                           dmod.Discriminator(ngpu=1, ndf=128, nc=3),
                           nz=256, batch=batch)
        blob.update(
            note="PyTorch reference implementation measured on this host "
                 "(CPU; no CUDA available). Pair matches bench.py's "
                 "warm-fallback pair. The reference publishes no GPU "
                 "throughput (BASELINE.md).",
            pair=f"G2(ngf=256)+D3_wgangp(ndf=128), wganlazygpR2 step, "
                 f"batch {batch}",
            reference_images_per_sec=res["images_per_sec"],
            pair_detail=res,
        )
        print("pair:", res)

    if which in ("flagship", "both"):
        gmod = load_ref_module("generators/generator_13_5.py", "ref_g135")
        dmod = load_ref_module("discriminators/discriminator_9_4.py",
                               "ref_d94")
        t0 = time.perf_counter()
        g = gmod.Generator(256)
        d = dmod.Discriminator()
        print(f"flagship instantiation: {time.perf_counter() - t0:.1f}s")
        res = measure_pair(g, d, nz=256, batch=batch, steps_pen=1,
                           steps_nopen=2)
        blob.update(
            flagship=f"G13_5+D9_4, wganlazygpR2 step, batch {batch}",
            reference_images_per_sec_flagship=res["images_per_sec"],
            flagship_detail=res,
        )
        print("flagship:", res)

    with open(out_path, "w") as f:
        json.dump(blob, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
