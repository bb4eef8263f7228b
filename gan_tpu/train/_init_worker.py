"""Subprocess worker: initialize model variables on the PURE CPU jax
backend and serialize them.

Why a subprocess: under the axon TPU platform, both eager dispatch and
XLA compiles route through a (single-core, slow) AOT relay — a deep zoo
model's init takes 20-60 minutes either way. A fresh process with
JAX_PLATFORMS=cpu uses the plain CPU plugin where the same eager init
takes seconds. The parent deserializes and device_puts once.

Protocol: argv = [payload.pkl, out.msgpack]; payload is a pickle of
(g_model, d_model, seed, batch_size, image_size). Output is
flax.serialization.to_bytes of {"g": g_vars, "d": d_vars}.
"""

import os
import pickle
import sys


def main(payload_path: str, out_path: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import flax.serialization

    with open(payload_path, "rb") as f:
        g_model, d_model, seed, batch_size, image_size = pickle.load(f)

    rng = jax.random.PRNGKey(seed)
    kg, kd, kn = jax.random.split(rng, 3)
    z = jnp.zeros((batch_size, g_model.z_dim), jnp.float32)
    x = jnp.zeros((batch_size, *image_size), jnp.float32)
    g_vars = g_model.init({"params": kg, "noise": kn}, z, train=True)
    d_vars = d_model.init({"params": kd}, x, train=True, update_sn=False)
    blob = flax.serialization.to_bytes({"g": dict(g_vars), "d": dict(d_vars)})
    with open(out_path, "wb") as f:
        f.write(blob)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
