"""Test env: force an 8-device virtual CPU platform before jax initializes,
substituting for multi-chip hardware (SURVEY.md SS4 implication #4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Some environments pin JAX_PLATFORMS (e.g. to a TPU plugin) at interpreter
# startup; in-process config wins as long as the backend isn't initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
