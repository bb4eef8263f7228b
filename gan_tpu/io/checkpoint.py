"""Orbax checkpointing of the whole train-state pytree.

Replaces the reference's whole-module pickles (/root/reference/train/
trainunits.py:58-76 — which couple checkpoints to class definitions,
SURVEY.md Appendix A.7) with state-based Orbax checkpoints of
{g_params, d_params, g/d optimizer slots, batch_stats, spectral u-vectors,
step}: framework-decoupled, async-capable, multi-host safe. Resume is
automatic-from-latest rather than filename-addressed manual
(trainunits.py:96-131).

Relay-aware fast paths (measured on this host's axon TPU tunnel,
docs/evidence/relay_io.md): device->host is capped at ~17-32 MB/s no
matter the chunking/concurrency, host->device runs ~200-300 MB/s, and
letting Orbax drive per-leaf device transfers itself measured ~6 MB/s
(15 min each way for the 5.3 GB flagship state, r2 trainrun evidence).
So:

- save: take an on-device SNAPSHOT (jitted identity copy — the step
  donates its input buffers, so live buffers can't be fetched
  concurrently), return immediately, and fetch + Orbax-write in a
  background worker. The train loop never blocks on the relay; wall
  durability lag is bounded by the relay cap (~3-5 min for 5.3 GB),
  loop stall is ~0 s.
- restore: Orbax-restore to HOST numpy (disk speed), then one
  device_put per leaf onto the template's devices (~300 MB/s).
"""

import os
import queue
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _host_template(state):
    """Abstract numpy restore template (keeps Orbax off the devices)."""

    def f(x):
        a = x if hasattr(x, "dtype") else np.asarray(x)
        return jax.ShapeDtypeStruct(np.shape(a), a.dtype)

    return jax.tree_util.tree_map(f, state)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 background: bool = True):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._background = background
        self._q: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._err: Optional[BaseException] = None
        # jnp.copy under jit: fresh (non-aliased, dtype-preserving) buffers
        self._snapshot = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s))

    # -- background worker -------------------------------------------------

    def _ensure_worker(self):
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(
                target=self._drain, name="ckpt-save", daemon=True)
            self._worker.start()

    def _drain(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            step, snap = item
            try:
                host = jax.device_get(snap)
                del snap  # free the on-device snapshot before writing
                self._mngr.save(step, args=ocp.args.StandardSave(host))
                self._mngr.wait_until_finished()
            except BaseException as e:  # surfaced on the next save/close
                self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("background checkpoint save failed") from err

    # -- public API --------------------------------------------------------

    def save(self, step: int, state, wait: bool = False) -> None:
        self._raise_pending()
        # at most one in-flight snapshot (bounds the transient HBM to one
        # extra state copy; also keeps the blocking path from racing a
        # queued background write of the same step)
        if self._worker is not None and self._worker.is_alive():
            self._q.join()
            self._raise_pending()
        if step in (self._mngr.all_steps() or []):
            return  # already durably saved (e.g. final == last epoch save)
        if not self._background or wait:
            host = jax.device_get(state)
            self._mngr.save(step, args=ocp.args.StandardSave(host))
            if wait:
                self._mngr.wait_until_finished()
            return
        try:
            snap = self._snapshot(state)
        except Exception:
            # snapshot copy needs transient HBM for the whole state; on
            # OOM fall back to a blocking fetch of the live buffers
            host = jax.device_get(state)
            self._mngr.save(step, args=ocp.args.StandardSave(host))
            return
        self._ensure_worker()
        self._q.put((step, snap))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        """Restore into the structure (and devices) of state_template."""
        self.wait_until_finished()
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        host = self._mngr.restore(
            step, args=ocp.args.StandardRestore(_host_template(state_template))
        )
        # one device_put per leaf onto the template leaf's sharding/device
        # (H2D over the relay runs ~10x faster than Orbax's own placement)
        def put(h, t):
            if hasattr(t, "sharding"):
                return jax.device_put(h, t.sharding)
            return h

        return jax.tree_util.tree_map(put, host, state_template)

    def wait_until_finished(self) -> None:
        if self._worker is not None and self._worker.is_alive():
            self._q.join()
        self._mngr.wait_until_finished()
        self._raise_pending()

    def close(self) -> None:
        self.wait_until_finished()
        if self._worker is not None and self._worker.is_alive():
            self._q.put(None)
            self._worker.join(timeout=60)
        self._mngr.close()
