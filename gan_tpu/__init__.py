"""gan_tpu — a TPU-native GAN training framework (JAX / Flax / pjit / Pallas).

From-scratch rebuild of the capability surface of the `xxxxx23124/-GAN-`
64x64 art-GAN workbench (reference mounted at /root/reference), redesigned
TPU-first:

- NHWC image layout everywhere (TPU conv layout), z enters as (B, nz).
- Functional core: jitted, donated train steps over an explicit state pytree
  (params, optimizer slots, batch-norm stats, spectral-norm power-iteration
  vectors, PRNG key, step counter).
- The reference's ten training loops (train/{gan,ganR2,wgan,wgangp,wgangpR2,
  wgansn,wgansnR2,wgangpsnR2,wganlazygp,wganlazygpR2}.py) become one
  composable objective library: {bce, wasserstein} x {r1, r2, gp, lazy(k),
  weight-clip} with gradient penalties via grad-of-grad under jit.
- Data parallelism via jax.sharding.Mesh + NamedSharding (GSPMD global-view),
  so whole-batch semantics (BatchNorm, MiniBatchStdDev) hold across devices
  without explicit collectives in model code.
"""

__version__ = "0.1.0"
