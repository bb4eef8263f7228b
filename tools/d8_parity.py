"""D8 golden value parity vs the torch reference (VERDICT r3 #4).

Builds the reference labml-StyleGAN2 Discriminator
(/root/reference/discriminators/discriminator_8.py:259-325) and the
rebuild's Discriminator8, imports the torch weights through
io/torch_import_d8.py, and asserts forward parity (D8 has no BatchNorm —
a single mode covers it; batch 8 exercises the MiniBatchStdDev group
flatten, the 1/sqrt(2) residual scaling, and the channel-major head
flatten re-ordering).

Usage: python tools/d8_parity.py [--batch 8]
Writes docs/evidence/d8_parity.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from g135_parity import reexec_scrubbed  # noqa: E402


def load_ref_d8():
    import importlib.util

    sys.path.insert(0, "/root/reference")
    spec = importlib.util.spec_from_file_location(
        "ref_d8", "/root/reference/discriminators/discriminator_8.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    if (os.environ.get("G135_PARITY_INNER") != "1"
            and (os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
                 or "axon" in os.environ.get("JAX_PLATFORMS", ""))):
        reexec_scrubbed()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import torch

    from gan_tpu.models import build_discriminator
    from gan_tpu.io.torch_import_d8 import import_d8

    t0 = time.time()
    ref = load_ref_d8()
    torch.manual_seed(0)
    import math

    td = ref.Discriminator(log_resolution=int(math.log2(64)))
    td.eval()
    n_torch = int(sum(p.numel() for p in td.parameters() if p.requires_grad))
    print(f"# torch D8 built: {n_torch} params ({time.time() - t0:.1f}s)")

    d = build_discriminator("D8")
    v = dict(d.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((args.batch, 64, 64, 3)), train=False,
                    update_sn=False))
    v = jax.tree_util.tree_map(np.asarray, v)
    print(f"# flax init done ({time.time() - t0:.1f}s)")

    v2 = import_d8(v, td.state_dict())
    print(f"# import done ({time.time() - t0:.1f}s)")

    x = np.random.default_rng(7).normal(
        size=(args.batch, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = td(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    ours = np.asarray(d.apply({"params": v2["params"]}, jnp.asarray(x),
                              train=False, update_sn=False))
    max_abs = float(np.abs(ours - theirs).max())
    ref_scale = float(np.abs(theirs).max())
    rel = max_abs / ref_scale
    print(f"# max|diff|={max_abs:.3e} ref_max={ref_scale:.3f} rel={rel:.3e} "
          f"({time.time() - t0:.1f}s)")
    assert ref_scale > 1e-3, "degenerate reference output"
    assert rel < args.tol, "D8 parity FAILED"

    out = {"batch": args.batch,
           "max_abs_diff": max_abs, "ref_max": ref_scale, "rel": rel,
           "status": "PASS", "torch_trainable": n_torch}
    with open("docs/evidence/d8_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
