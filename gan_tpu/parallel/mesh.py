"""Device mesh + sharding rules.

The reference's only parallelism is commented-out nn.DataParallel
(/root/reference/units/get_generators.py:19-20 et al.; single device in
practice, SURVEY.md SS2.6). The TPU-native replacement:

- a ('data', 'model') Mesh over ICI;
- batch axis sharded over 'data' (pure DP; gradients all-reduce via the
  psum GSPMD inserts automatically because the loss is a global mean);
- optional tensor parallelism: wide conv kernels / dense layers shard their
  output-channel dimension over 'model' (the DCGAN ngf=256 layers and the
  MLP heads split cleanly), with XLA inserting the matching all-gathers /
  reduce-scatters over ICI.

Because train steps are jit-compiled global-view programs, whole-batch
semantics (BatchNorm, MiniBatchStdDev) are preserved exactly under DP — the
cross-replica reductions SURVEY.md SS2.6 requires are emitted by GSPMD.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_pspec(path: str, leaf, n_model: int, min_size: int) -> P:
    """Tensor-parallel rule: shard the output-channel (last) dim of conv
    kernels / dense matrices over 'model' when big and divisible; biases and
    norm scales stay replicated."""
    if n_model <= 1 or leaf.ndim < 2:
        return P()
    out_ch = leaf.shape[-1]
    if out_ch % n_model == 0 and out_ch >= min_size:
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def param_pspecs(params, mesh: Mesh, min_size: int = 128):
    """PartitionSpecs for a param pytree under the mesh's 'model' axis."""
    n_model = mesh.shape["model"]

    def f(path, leaf):
        return _leaf_pspec(jax.tree_util.keystr(path), leaf, n_model, min_size)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh, min_size: int = 128):
    """device_put a param pytree with TP-over-'model' shardings."""
    specs = param_pspecs(params, mesh, min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
