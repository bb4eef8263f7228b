from gan_tpu.utils.pytree import param_count, tree_bytes  # noqa: F401
