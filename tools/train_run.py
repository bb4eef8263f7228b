"""Sustained training run for evidence (VERDICT r1 task 6): multi-epoch
Trainer run on the real TPU with checkpoint/resume exercised mid-run,
sample grids, loss records/plot, and an FID-proxy trend.

The reference's own artifact is a 24-epoch sample grid + 47-epoch video on
cats-faces (/root/reference/README.md:7-13). No image corpus is mounted on
this machine (zero egress), so the default corpus is the deterministic
synthetic dataset; pass --dataroot to use a real folder corpus.

Flow:
  phase 1: train `--epochs1` epochs, then STOP (simulated interruption).
  phase 2: a fresh Trainer in the same workdir auto-resumes from the
           latest checkpoint and trains to `--epochs`.
  end:     FID-proxy between a final sample batch and the corpus;
           summary JSON written to <workdir>/train_run_summary.json.

Usage:
  python tools/train_run.py --workdir /tmp/run2 --generator G13_5 \
      --discriminator D9_4 --dtype bf16 --batch 16 --epochs 6 --epochs1 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class DeviceResidentLoader:
    """Keeps the normalized corpus ON DEVICE and gathers batches there.

    The per-step host->device batch upload plus the separate preprocess
    dispatch cost multiple relay round trips each step (r3 measured the
    Trainer loop at ~6.6 s/step vs bench's 1.1 s/step on the same warm
    program — tools/diag_step_overhead.py isolates the variants). Batches
    yielded by this loader are device arrays: the Trainer runs with
    preprocess=False and the only per-step host payloads are the tiny
    index/key arrays."""

    def __init__(self, ds, batch_size, seed=0):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from gan_tpu.data.augment import normalize, random_hflip

        self.batch_size = batch_size
        images = np.asarray(ds.images)
        self.n = len(images)
        self._nb = self.n // batch_size
        self._rng = np.random.default_rng(seed)
        mean = np.asarray(ds.mean, np.float32)
        std = np.asarray(ds.std, np.float32)
        corpus = jax.device_put(images)
        self._data = jax.jit(
            lambda c: normalize(c.astype(jnp.float32) / 255.0, mean, std)
        )(corpus)
        flip = bool(getattr(ds, "flip", True))
        # flip key derived INSIDE the jitted gather (fold_in on the batch's
        # first corpus index): a per-step eager PRNGKey() is a remote
        # round trip under the axon relay (see diag_step_overhead.py)
        self._gather = jax.jit(
            (lambda d, idx, ekey: random_hflip(
                jax.random.fold_in(ekey, idx[0]), d[idx])) if flip
            else (lambda d, idx, ekey: d[idx])
        )
        self._base_key = jax.random.PRNGKey(seed)  # one eager op, once
        self._epoch = 0

    def __len__(self):
        return self._nb

    def __iter__(self):
        import jax
        import numpy as np

        perm = self._rng.permutation(self.n)[: self._nb * self.batch_size]
        perm = perm.reshape(self._nb, self.batch_size).astype(np.int32)
        self._epoch += 1
        ekey = jax.random.fold_in(self._base_key, self._epoch)  # 1/epoch
        for i in range(self._nb):
            yield self._gather(self._data, perm[i], ekey)


def build(args, dtype):
    from gan_tpu.data import DataLoader, ImageFolderDataset, SyntheticDataset
    from gan_tpu.models import build_generator, build_discriminator
    from gan_tpu.objectives import get_objective
    from gan_tpu.train.loop import Trainer

    if args.dataroot:
        ds = ImageFolderDataset(args.dataroot)
    else:
        ds = SyntheticDataset(n=args.synthetic_n, size=(64, 64), seed=0)
    if args.on_device_data:
        loader = DeviceResidentLoader(ds, batch_size=args.batch, seed=0)
    else:
        loader = DataLoader(ds, batch_size=args.batch, seed=0)

    gkw = {}
    if args.generator == "G13_5":
        gkw = dict()
    g = build_generator(args.generator, z_dim=args.nz, dtype=dtype, **gkw)
    d = build_discriminator(args.discriminator, dtype=dtype)
    obj = get_objective(args.objective)
    # endurance-run cadence overrides: per-30-iter grid dumps cost ~6x
    # wall throughput over the relay (r2 SUMMARY: 2.4 img/s wall vs 15.6+
    # steady); the reference's own video cadence is one grid / 200 iters
    import dataclasses

    over = {}
    if args.image_every is not None:
        over["image_every"] = args.image_every
    if args.record_every is not None:
        over["record_every"] = args.record_every
    if over:
        obj = dataclasses.replace(obj, **over)
    return ds, loader, g, d, obj


def make_trainer(args, dtype, num_epochs):
    from gan_tpu.train.loop import Trainer

    ds, loader, g, d, obj = build(args, dtype)
    return ds, Trainer(
        dataloader=loader,
        num_epochs=num_epochs,
        nz=args.nz,
        generator=g,
        generator_name=args.generator,
        discriminator=d,
        discriminator_name=args.discriminator,
        objective=obj,
        workdir=args.workdir,
        log_every=args.log_every,
        use_cadence=args.cadence,
        preprocess=not args.on_device_data,
        sync_every=args.sync_every,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--generator", default="G13_5")
    p.add_argument("--discriminator", default="D9_4")
    p.add_argument("--objective", default="wganlazygpR2")
    p.add_argument("--nz", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--epochs", type=int, default=6)
    p.add_argument("--epochs1", type=int, default=2,
                   help="epochs before the simulated interruption")
    p.add_argument("--resume-points", default=None,
                   help="comma-separated epoch cut points for a multi-"
                        "resume endurance run, e.g. '2,4,6' with "
                        "--epochs 8 -> 4 phases / 3 resumes "
                        "(overrides --epochs1)")
    p.add_argument("--image-every", type=int, default=None,
                   help="override the objective's sample-grid cadence")
    p.add_argument("--record-every", type=int, default=None,
                   help="override the objective's record cadence")
    p.add_argument("--synthetic-n", type=int, default=2048)
    p.add_argument("--dataroot", default=None)
    p.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    p.add_argument("--log-every", type=int, default=20)
    p.add_argument("--cadence", action="store_true")
    p.add_argument("--platform", default=None,
                   help="force a jax platform in-process (e.g. cpu — "
                        "shell-level JAX_PLATFORMS is pinned to axon)")
    p.add_argument("--on-device-data", action="store_true",
                   help="device-resident normalized corpus + on-device "
                        "batch gather (DeviceResidentLoader docstring)")
    p.add_argument("--sync-every", type=int, default=0,
                   help="fetch a metric scalar every N steps (keeps the "
                        "relay queue shallow; see Trainer.sync_every)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    os.makedirs(args.workdir, exist_ok=True)
    dtype = None
    if args.dtype == "bf16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16

    t0 = time.time()
    # phase boundaries (in epochs): each boundary = train -> STOP
    # (simulated interruption) -> fresh Trainer auto-resumes
    if args.resume_points:
        cuts = [int(c) for c in args.resume_points.split(",")]
    else:
        cuts = [args.epochs1]
    assert all(0 < c < args.epochs for c in cuts) and cuts == sorted(cuts)
    phases = cuts + [args.epochs]

    phase_times = []
    resumes = []
    tr2 = None
    steps_per_epoch = None
    ds = None
    for pi, target_epochs in enumerate(phases):
        tp0 = time.time()
        ds_i, tr = make_trainer(args, dtype, num_epochs=target_epochs)
        ds = ds_i
        if steps_per_epoch is None:
            steps_per_epoch = len(tr.dataloader)
        resumed_at = tr.epoch * steps_per_epoch + tr.i
        if pi > 0:
            assert resumed_at >= phases[pi - 1] * steps_per_epoch, (
                f"resume failed: phase {pi} restarted at step {resumed_at},"
                f" expected >= {phases[pi - 1] * steps_per_epoch}")
            resumes.append(resumed_at)
            print(f"# phase {pi}: resumed at step {resumed_at}")
        tr.train()
        phase_times.append(round(time.time() - tp0, 1))
        if pi < len(phases) - 1:
            # release this phase's ~5.3 GB device state BEFORE the next
            # phase's create_state + restore: keeping it alive (the old
            # `tr2 = tr` did) peaks at 3x state and OOMs 16 GB HBM when a
            # phase starts from an existing checkpoint
            tr.state = None
            del tr
        else:
            tr2 = tr
    t2 = time.time()

    # ---- evidence: FID proxy vs the corpus on a fresh sample batch
    import jax
    import numpy as np

    from gan_tpu.eval import fid as fid_mod

    n_eval = min(256, len(ds.images))
    z = jax.random.normal(jax.random.PRNGKey(123), (64, args.nz))
    fake = np.asarray(jax.device_get(
        tr2._sample(tr2.state.g_params, tr2.state.g_state, z)),
        np.float32)
    # both streams in [0,1]: corpus uint8/255; G output ~tanh -> (x+1)/2
    fake01 = np.clip((fake + 1.0) / 2.0, 0.0, 1.0)
    real01 = ds.images[:n_eval].astype(np.float32) / 255.0
    try:
        fid_res = fid_mod.compute_fid([real01], [fake01])
        fid_val = round(float(fid_res["value"]), 4)
        fid_metric = fid_res["metric"]
    except Exception as e:  # proxy never blocks the run evidence
        fid_val, fid_metric = None, None
        print(f"# fid proxy failed: {type(e).__name__}: {e}")

    total_steps = args.epochs * steps_per_epoch
    last_phase_steps = total_steps - (phases[-2] * steps_per_epoch
                                      if len(phases) > 1 else 0)
    summary = {
        "pair": f"{args.generator}+{args.discriminator}",
        "objective": args.objective,
        "dtype": args.dtype,
        "batch": args.batch,
        "steps_per_epoch": steps_per_epoch,
        "epochs": args.epochs,
        "total_steps": total_steps,
        "resumes_exercised_at_steps": [int(r) for r in resumes],
        "phase_sec": phase_times,
        "total_sec": round(t2 - t0, 1),
        "img_per_sec_last_phase": round(
            last_phase_steps * args.batch / max(phase_times[-1], 1e-9), 2),
        "img_per_sec_wall": round(
            total_steps * args.batch / max(t2 - t0, 1e-9), 2),
        "fid_proxy_final": fid_val,
        "fid_metric": fid_metric,
    }
    with open(os.path.join(args.workdir, "train_run_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
