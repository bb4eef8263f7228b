"""G8 golden value parity vs the torch reference (VERDICT r3 #4).

Builds the reference Generator (/root/reference/generators/generator_8.py:
193-260, planes fixed at 64) and the rebuild's Generator8, imports the
torch weights through the name-directed translator (io/torch_import_g8.py),
and asserts forward parity in eval and train BN modes. G8's spine
(stage-skip concat + RiR vmap stacks + SE gates + DLA trees) is shared by
G9/G10/G10_2/G11, so value parity here certifies the whole family's wiring.

Usage: python tools/g8_parity.py [--z 64] [--batch 8]
Writes docs/evidence/g8_parity.json.

Runs EAGERLY on plain CPU (re-execs into a scrubbed subprocess under the
axon relay — see tools/g135_parity.py for the rationale).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from g135_parity import reexec_scrubbed  # noqa: E402


def load_ref_g8():
    import importlib.util
    import types

    sys.path.insert(0, "/root/reference")
    for stub_name in ("torchsummary", "torchviz"):
        if stub_name not in sys.modules:
            stub = types.ModuleType(stub_name)
            stub.summary = stub.make_dot = lambda *a, **k: None
            sys.modules[stub_name] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_g8", "/root/reference/generators/generator_8.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    if (os.environ.get("G135_PARITY_INNER") != "1"
            and (os.environ.get("PALLAS_AXON_REMOTE_COMPILE")
                 or "axon" in os.environ.get("JAX_PLATFORMS", ""))):
        reexec_scrubbed()
    ap = argparse.ArgumentParser()
    ap.add_argument("--z", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--eval-tol", type=float, default=1e-4)
    ap.add_argument("--train-tol", type=float, default=1e-3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import torch

    from gan_tpu.models import build_generator, core
    from gan_tpu.io.torch_import_g8 import import_g8

    t0 = time.time()
    ref = load_ref_g8()
    torch.manual_seed(0)
    tg = ref.Generator(z_dim=args.z)
    n_torch = int(sum(p.numel() for p in tg.parameters() if p.requires_grad))
    print(f"# torch G8 built: {n_torch} params ({time.time() - t0:.1f}s)")

    g = build_generator("G8", z_dim=args.z)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    v = g.init(rngs, jnp.zeros((args.batch, args.z)), train=True)
    v = jax.tree_util.tree_map(np.asarray, dict(v))
    print(f"# flax init done ({time.time() - t0:.1f}s)")

    v2 = import_g8(v, tg.state_dict())
    print(f"# import done ({time.time() - t0:.1f}s)")

    z = np.random.default_rng(7).normal(
        size=(args.batch, args.z)).astype(np.float32)
    results = {}
    for mode in ("eval", "train"):
        train = mode == "train"
        tg.train(train)
        with torch.no_grad():
            theirs = tg(torch.from_numpy(z).reshape(args.batch, args.z, 1, 1)
                        ).numpy().transpose(0, 2, 3, 1)
        with core.exact_batchnorm_variance():
            out = g.apply(
                {"params": v2["params"], "batch_stats": v2["batch_stats"]},
                jnp.asarray(z), train=train,
                **({"mutable": ["batch_stats"]} if train else {}))
        ours = np.asarray(out[0] if train else out)
        max_abs = float(np.abs(ours - theirs).max())
        ref_scale = float(np.abs(theirs).max())
        results[mode] = {"max_abs_diff": max_abs, "ref_max": ref_scale,
                         "rel": max_abs / ref_scale}
        print(f"# {mode}: max|diff|={max_abs:.3e} ref_max={ref_scale:.3f} "
              f"rel={max_abs / ref_scale:.3e} ({time.time() - t0:.1f}s)")
        assert ref_scale > 0.05, "degenerate reference output"
        tol = args.eval_tol if mode == "eval" else args.train_tol
        assert max_abs / ref_scale < tol, f"{mode} parity FAILED"

    out = {"z_dim": args.z, "batch": args.batch, "modes": results,
           "status": "PASS", "torch_trainable": n_torch}
    with open("docs/evidence/g8_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
