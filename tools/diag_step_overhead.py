"""Isolate the Trainer-loop per-step overhead vs bench's tight loop.

r3 observation: bench measures ~1.1 s/step (bf16@16 flagship, warm), but
the Trainer endurance loop ran ~6.6 s/step with artifacts 10x rarer than
r2 — so the overhead is per-step host work, not artifact IO. This tool
times the SAME warm step program under the candidate loop shapes:

  A  device-resident batch, fresh host PRNGKey per step   (bench's loop)
  B  fresh numpy f32 batch each step (H2D per step)
  C  numpy uint8 batch -> jitted preprocess -> step       (Trainer's loop)
  D  C + per-step numpy key indexing from a pre-split epoch array

Prints seconds/step for each. One warm process, ~20 min total.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state, build_train_step
    from gan_tpu.data.augment import preprocess_batch
    from __graft_entry__ import _flagship

    n = int(os.environ.get("DIAG_STEPS", "10"))
    batch_size = 16
    g, d, g_name, d_name = _flagship(tiny=False, dtype=jnp.bfloat16)
    obj = get_objective("wganlazygpR2")
    g_tx, d_tx = obj.make_optimizers(flat=False)
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()

    def mark(s):
        print(f"# t+{time.perf_counter() - t0:7.1f}s {s}", flush=True)

    state = create_state(rng, g, d, g_tx, d_tx, batch_size=batch_size,
                         image_size=(64, 64, 3))
    mark("state ready")
    step = build_train_step(g, d, obj, g_tx, d_tx, jit=True)
    batch_dev = jax.random.normal(rng, (batch_size, 64, 64, 3))
    state, m = step(state, batch_dev, jax.random.PRNGKey(1), 0)
    state, m = step(state, batch_dev, jax.random.PRNGKey(2), 1)
    jax.device_get(m)
    mark("warm")
    # absorb the one-time first-dispatch session cost outside timings
    state, m = step(state, batch_dev, jax.random.PRNGKey(3), 0)
    jax.device_get(m)
    mark("session absorbed")

    host_rng = np.random.default_rng(0)
    raw_u8 = (host_rng.uniform(size=(n, batch_size, 64, 64, 3)) * 255
              ).astype(np.uint8)
    raw_f32 = host_rng.normal(size=(n, batch_size, 64, 64, 3)
                              ).astype(np.float32)
    prep = jax.jit(lambda k, r: preprocess_batch(
        k, r, out_size=(64, 64), mean=np.zeros(3, np.float32),
        std=np.ones(3, np.float32), flip=True))
    # warm the preprocess program
    jax.device_get(prep(jax.random.PRNGKey(9), raw_u8[0]))
    mark("prep warm")

    results = {}

    def timed(name, body):
        nonlocal state
        t = time.perf_counter()
        m = None
        for i in range(n):
            m = body(i)
        jax.device_get(m)
        dt = (time.perf_counter() - t) / n
        results[name] = dt
        mark(f"{name}: {dt:.3f} s/step")

    keys = [jax.random.PRNGKey(100 + i) for i in range(n)]
    jax.block_until_ready(keys)

    def body_a(i):
        nonlocal state
        state, m = step(state, batch_dev, keys[i], i)
        return m

    timed("A device batch", body_a)

    def body_b(i):
        nonlocal state
        state, m = step(state, raw_f32[i], keys[i], i)
        return m

    timed("B numpy batch", body_b)

    def body_c(i):
        nonlocal state
        b = prep(keys[i], raw_u8[i])
        state, m = step(state, b, keys[i], i)
        return m

    timed("C numpy+preprocess", body_c)

    epoch_keys = np.asarray(jax.random.split(jax.random.PRNGKey(7), 2 * n))
    mark("epoch keys split")

    def body_d(i):
        nonlocal state
        b = prep(epoch_keys[i], raw_u8[i])
        state, m = step(state, b, epoch_keys[n + i], i)
        return m

    timed("D numpy keys+preprocess", body_d)
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
