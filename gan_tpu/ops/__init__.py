"""TPU-native fused ops (Pallas kernels + reference einsum paths)."""

from gan_tpu.ops.attention import attention_core  # noqa: F401
