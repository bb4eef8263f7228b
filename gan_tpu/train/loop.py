"""The training loop driver.

Replaces the reference Train.train() epoch loops (/root/reference/train/
gan.py:55-77 et al.): epochs over the loader, jitted step dispatch on the
lazy cadence, reference artifact cadences (fixed-noise sample grids, record
txt/series, loss plot), Orbax checkpointing with auto-resume-from-latest.

TPU-first: the step is fully jitted and state-donated; metrics are fetched
(device sync) only on the record cadence, not every iteration — the
reference's per-step .item() sync (SURVEY.md SS3.2) is the first thing a
TPU port must *not* do.
"""

import os
import time
from typing import Optional

import jax
import numpy as np

from gan_tpu.data.augment import preprocess_batch
from gan_tpu.utils.cache import enable_compilation_cache
from gan_tpu.io.checkpoint import CheckpointManager
from gan_tpu.io.images import save_image_grid
from gan_tpu.io.records import Recorder
from gan_tpu.objectives import Objective
from gan_tpu.train.state import create_state
from gan_tpu.train.step import build_train_step
from gan_tpu.utils import param_count


class Trainer:
    def __init__(
        self,
        dataloader,
        num_epochs: int,
        nz: int,
        generator,
        generator_name: str,
        discriminator,
        discriminator_name: str,
        objective: Objective,
        seed: int = 0,
        workdir: str = ".",
        image_size=(64, 64),
        checkpoint: bool = True,
        preprocess: bool = True,
        log_every: int = 50,
        use_cadence: bool = False,
        sync_every: int = 0,
        finite_guard: Optional[bool] = None,
    ):
        """finite_guard: skip updates whose metrics go non-finite
        (utils/guards.py; SURVEY SS5.3). None defers to the
        GAN_TPU_FINITE_GUARD env flag (default off — the guard changes the
        step program, so it follows the same flip-with-re-prewarm rule as
        the other program levers)."""
        enable_compilation_cache()
        self.dataloader = dataloader
        self.num_epochs = num_epochs
        self.nz = nz
        self.g_model = generator
        self.g_name = generator_name
        self.d_model = discriminator
        self.d_name = discriminator_name
        self.obj = objective
        self.workdir = workdir
        self.image_size = image_size
        self.preprocess = preprocess
        self.log_every = log_every
        # one device dispatch per lazy interval (train/step.py cadence):
        # k steps run on-device via lax.scan. Record/image cadences are
        # preserved because the reference's 20/30-iter cadences are
        # multiples of the lazy interval 5 (wganlazygpR2.py:92-106).
        self.use_cadence = use_cadence and objective.lazy_interval > 1

        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng, noise_rng = jax.random.split(self.rng, 3)

        # dataset-declared transform stats (data/datasets.py): ImageNet
        # normalize + flip for image folders (dataloader.py:7-12), 0.5/0.5
        # no-flip single-channel for MNIST (dataloader.py:16-27)
        ds = getattr(dataloader, "dataset", None)
        from gan_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

        # numpy (not device) constants: they fold into the jitted
        # preprocess; eager device ops are per-op AOT round trips here
        norm_mean = np.asarray(
            getattr(ds, "mean", None) or IMAGENET_MEAN, np.float32)
        norm_std = np.asarray(
            getattr(ds, "std", None) or IMAGENET_STD, np.float32)
        flip = bool(getattr(ds, "flip", True))
        self.channels = int(getattr(ds, "channels", 3))

        g_tx, d_tx = objective.make_optimizers()
        self.state = create_state(
            init_rng,
            generator,
            discriminator,
            g_tx,
            d_tx,
            batch_size=dataloader.batch_size,
            image_size=(*image_size, self.channels),
        )
        self.step_fn = build_train_step(generator, discriminator, objective,
                                        g_tx, d_tx, guard=finite_guard)
        # fixed eval noise, reference-sized per trainer (gan.py:13 -> 64;
        # wganlazygp*.py:11 -> 16)
        self.fixed_noise = jax.random.normal(noise_rng, (objective.fixed_noise, nz))
        self.recorder = Recorder()
        self.epoch = 0
        self.i = 0

        print(f"# generator parameters: {param_count(self.state.g_params)}")
        print(f"# discriminator parameters: {param_count(self.state.d_params)}")

        self.ckpt: Optional[CheckpointManager] = None
        if checkpoint:
            self.ckpt = CheckpointManager(os.path.join(workdir, "checkpoint"))
            latest = self.ckpt.latest_step()
            if latest is not None:
                print(f"==> resuming from checkpoint step {latest}")
                self.state = self.ckpt.restore(self.state, latest)
                epoch_len = len(self.dataloader)
                self.epoch = latest // max(epoch_len, 1)
                self.i = latest % max(epoch_len, 1)

        self._preprocess = jax.jit(
            lambda rng, raw: preprocess_batch(
                rng, raw, out_size=image_size,
                mean=norm_mean, std=norm_std, flip=flip)
        )
        self._sample = jax.jit(
            lambda g_params, g_state, z: generator.apply(
                {"params": g_params, **g_state}, z, train=False,
                rngs={"noise": jax.random.PRNGKey(0)},
            )
        )
        self._make_keys = None  # built per dataloader length (train())
        # sync_every > 0: fetch one metric scalar every N steps to keep
        # the relay's dispatch queue SHALLOW. This relay serves per-step
        # fetches cheaply (bench debug: ~0.1 s) but a fetch issued after
        # hundreds of queued steps stalls for minutes ("first fetch after
        # large queue build-ups", docs/evidence/kernel_breakdown caveat) —
        # artifact cadences like image_every=200 hit exactly that mode.
        self.sync_every = sync_every

    # ------------------------------------------------------------------

    def save_images(self, epoch: int, i: int) -> None:
        imgs = self._sample(self.state.g_params, self.state.g_state, self.fixed_noise)
        path = os.path.join(self.workdir, "generated_images", f"{epoch}-{i}.png")
        save_image_grid(np.asarray(jax.device_get(imgs)), path)

    def train(self) -> None:
        obj = self.obj
        print("Starting Training Loop...")
        t0 = time.time()
        n_imgs = 0
        for epoch in range(self.epoch, self.num_epochs):
            # one key-split per epoch, not per step — AND the per-step keys
            # must be DEVICE-RESIDENT SINGLES: a host (numpy) key argument
            # on the donated step dispatch costs ~4.5 s/step of synchronous
            # transfer over the relay, vs 0.86 s/step with device keys
            # (measured, tools/diag_step_overhead.py: A=0.863 device batch
            # +keys, D=5.361 same program with numpy keys, B=14.273 with a
            # numpy batch). One jitted call returns a TUPLE of keys so each
            # is its own device buffer passed by reference below.
            n = max(len(self.dataloader), 1)
            if self._make_keys is None:
                self._make_keys = jax.jit(
                    lambda k: tuple(jax.random.split(k, 2 * n + 1)))
            epoch_keys = self._make_keys(self.rng)
            self.rng = epoch_keys[0]
            prep_keys = epoch_keys[1 : n + 1]
            step_keys = epoch_keys[n + 1 :]
            k = obj.lazy_interval if self.use_cadence else 1
            buf = []
            done = []  # (i, per-step metrics) finished this iteration
            for i, raw in enumerate(self.dataloader):
                prep_rng, step_rng = prep_keys[i], step_keys[i]
                batch = (
                    self._preprocess(prep_rng, raw) if self.preprocess else raw
                )
                done = []
                if k > 1:
                    buf.append((i, batch, step_rng))
                    is_tail = i == n - 1 and len(buf) < k
                    if len(buf) == k:
                        batches = jax.numpy.stack([b[1] for b in buf])
                        keys = jax.numpy.stack(
                            [jax.numpy.asarray(b[2]) for b in buf]
                        )
                        self.state, ms = self.step_fn.cadence(
                            self.state, batches, keys
                        )
                        done = [
                            (bi, jax.tree_util.tree_map(
                                lambda a, j=j: a[j], ms))
                            for j, (bi, _, _) in enumerate(buf)
                        ]
                        buf = []
                    elif is_tail:  # loader tail: single-step fallback
                        for bi, bb, bk in buf:
                            self.state, m = self.step_fn(self.state, bb, bk, bi)
                            done.append((bi, m))
                        buf = []
                else:
                    self.state, metrics = self.step_fn(
                        self.state, batch, step_rng, i
                    )
                    done = [(i, metrics)]
                n_imgs += batch.shape[0]
                if self.sync_every and i % self.sync_every == 0 and done:
                    jax.device_get(done[-1][1]["g_loss"])

                for si, metrics in done:
                    self._bookkeep(epoch, si, metrics, t0, n_imgs)
            if self.ckpt is not None and obj.ckpt_every_epoch:
                self.ckpt.save((epoch + 1) * len(self.dataloader), self.state)
        if obj.record_every:
            self.recorder.plot(os.path.join(self.workdir, obj.name), obj.record_every)
        if self.ckpt is not None:
            final_step = max(self.num_epochs, 1) * len(self.dataloader)
            # save() drains any in-flight background epoch save first and
            # no-ops if that save already covered final_step
            self.ckpt.save(final_step, self.state, wait=True)
            self.ckpt.wait_until_finished()  # durability before returning

    def _bookkeep(self, epoch: int, i: int, metrics, t0, n_imgs) -> None:
        """Per-step artifact cadences (reference cadences, SURVEY SS5.5).
        Fetches metric scalars only when a cadence fires."""
        obj = self.obj
        if obj.record_every and i % obj.record_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            record = [
                ("Discriminator real loss", m["real_loss"]),
                ("Discriminator fake loss", m["fake_loss"]),
                ("Gradient penalties", m["gp"]),
                ("Simplified gradient penalties R1", m["r1"]),
                ("Simplified gradient penalties R2", m["r2"]),
                ("Generator loss", m["g_loss"]),
            ]
            self.recorder.add(record)
            self.recorder.write_txt(os.path.join(self.workdir, obj.name), record)
        if obj.image_every and i % obj.image_every == 0:
            self.save_images(epoch, i)
        if self.log_every and i % self.log_every == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            ips = n_imgs / max(time.time() - t0, 1e-9)
            print(f"[{epoch}/{self.num_epochs}][{i}] {m} ({ips:.1f} img/s)")
