"""G13_5 golden value parity vs the torch reference (VERDICT r2 #2).

Builds the reference Generator (/root/reference/generators/
generator_13_5.py:610-631) and the rebuild's Generator13_5 at a given
size, imports the torch weights through the name-directed translator
(io/torch_import_g13.py), zeroes the StyleConv noise scales on both
sides (the only stochastic path), and asserts forward parity in both
eval and train BN modes.

Usage: python tools/g135_parity.py [--planes 8] [--z 32] [--batch 2]
Writes docs/evidence/g135_parity.json.
"""

import argparse
import importlib.util
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_ref_g135():
    sys.path.insert(0, "/root/reference")
    if "torchsummary" not in sys.modules:
        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_g135", "/root/reference/generators/generator_13_5.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--z", type=int, default=32)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--train-mode", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import torch

    from gan_tpu.models.generators.g13_5 import Generator13_5
    from gan_tpu.io.torch_import_g13 import import_g13_5

    t0 = time.time()
    ref = load_ref_g135()
    torch.manual_seed(0)
    tg = ref.Generator(z_dim=args.z, planes=args.planes)
    print(f"# torch model built ({time.time() - t0:.1f}s)")

    g = Generator13_5(z_dim=args.z, planes=args.planes, remat=False)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    v = jax.jit(
        lambda: g.init(rngs, jnp.zeros((args.batch, args.z)), train=True)
    )()
    v = jax.tree_util.tree_map(np.asarray, dict(v))
    print(f"# flax init done ({time.time() - t0:.1f}s)")

    v2 = import_g13_5(v, tg.state_dict())
    print(f"# import done ({time.time() - t0:.1f}s)")

    # zero the only stochastic path: StyleConv noise scales (both sides)
    def zero_noise(tree):
        return {
            k: (np.zeros_like(x) if k == "scale_noise" else x)
            if not hasattr(x, "items") else zero_noise(x)
            for k, x in tree.items()
        }

    v2["params"] = zero_noise(v2["params"])
    with torch.no_grad():
        for n, p in tg.named_parameters():
            if n.endswith("scale_noise"):
                p.zero_()

    z = np.random.default_rng(7).normal(
        size=(args.batch, args.z)).astype(np.float32)
    results = {}
    for mode in ("eval", "train"):
        train = mode == "train"
        tg.train(train)
        with torch.no_grad():
            theirs = tg(torch.from_numpy(z).reshape(args.batch, args.z, 1, 1)
                        ).numpy().transpose(0, 2, 3, 1)
        fwd = jax.jit(lambda v, z: g.apply(
            v, z, train=train, rngs={"noise": jax.random.PRNGKey(2)},
            **({"mutable": ["batch_stats"]} if train else {})))
        out = fwd({"params": v2["params"],
                   "batch_stats": v2["batch_stats"]}, jnp.asarray(z))
        ours = np.asarray(out[0] if train else out)
        max_abs = float(np.abs(ours - theirs).max())
        ref_scale = float(np.abs(theirs).max())
        results[mode] = {"max_abs_diff": max_abs, "ref_max": ref_scale,
                         "rel": max_abs / ref_scale}
        print(f"# {mode}: max|diff|={max_abs:.3e} ref_max={ref_scale:.3f} "
              f"rel={max_abs / ref_scale:.3e} ({time.time() - t0:.1f}s)")
        assert ref_scale > 0.05, "degenerate reference output"
        assert max_abs / ref_scale < 1e-4, f"{mode} parity FAILED"

    out = {"planes": args.planes, "z_dim": args.z, "batch": args.batch,
           "modes": results, "status": "PASS",
           "torch_trainable": int(sum(p.numel() for p in tg.parameters()
                                      if p.requires_grad))}
    with open("docs/evidence/g135_parity.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
