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

from typing import Callable, FrozenSet, Optional, Sequence, Tuple

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


def grouped_param_prefixes(init_fn: Callable) -> FrozenSet[Tuple[str, ...]]:
    """Path prefixes of modules whose params must NOT be tensor-parallel
    sharded, collected from the MODULE TREE (layer metadata), not shape
    heuristics.

    Grouped convolutions (torch groups>1 / XLA feature_group_count>1 —
    the depthwise bottlenecks of G4/G5/D7 and the folded channel-pair
    convs of models/paired.py) tie input channel block i to output
    channel block i; sharding only the kernel's output-channel dim breaks
    GSPMD's convolution partitioning (hard compile error: "Dimension
    numbers ..." on the conv custom-call — reproduced in
    tests/test_parallel.py::test_grouped_conv_tp_exclusion).

    init_fn: zero-arg callable running the model's `.init` (traced with
    jax.eval_shape — abstract, no FLOPs). A flax method interceptor
    records `module.path` for every module reporting grouped semantics
    via its own metadata: a `groups`/`feature_group_count` attribute > 1,
    or the `tp_grouped` marker the folded-pair modules set."""
    import flax.linen as nn

    prefixes = set()

    def record(next_fun, args, kwargs, context):
        m = context.module
        grouped = (
            getattr(m, "groups", 1) > 1
            or getattr(m, "feature_group_count", 1) > 1
            or (getattr(m, "tp_grouped", False) and getattr(m, "s", 2) > 1)
        )
        if grouped:
            # () = the root module itself is grouped -> exclude everything
            prefixes.add(tuple(m.path))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(record):
        jax.eval_shape(init_fn)
    return frozenset(prefixes)


def _leaf_pspec(path: Tuple, leaf, n_model: int, min_size: int,
                exclude: FrozenSet[Tuple[str, ...]]) -> P:
    """Tensor-parallel rule: shard the output-channel (last) dim of conv
    kernels (kh, kw, I, O) / dense matrices (I, O) over 'model' when big
    and divisible. Replicated: biases/norm scales (ndim<2), stacked
    nn.vmap/pair kernels (ndim>4 — they feed grouped or batched convs
    whose channel blocks must stay together), and anything under a
    grouped-conv module path (see grouped_param_prefixes)."""
    if n_model <= 1 or leaf.ndim < 2 or leaf.ndim > 4:
        return P()
    names = tuple(
        getattr(e, "key", getattr(e, "name", getattr(e, "idx", e)))
        for e in path
    )
    for pre in exclude:
        if names[: len(pre)] == pre or names[1: len(pre) + 1] == pre:
            return P()  # second form: leading collection key ('params')
    out_ch = leaf.shape[-1]
    # n_model^2 divisibility: when a channel-sharded activation feeds a
    # conv whose kernel output dim is also sharded, GSPMD may partition it
    # as a grouped conv needing (out_ch/n_model) % n_model == 0 — it hard
    # errors ("Expected output feature dimension ... divisible by
    # feature_group_count") rather than falling back at tiny widths. The
    # real TP targets (DCGAN ngf*k, MLP heads: multiples of 64) all pass.
    if out_ch % (n_model * n_model) == 0 and out_ch >= min_size:
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def param_pspecs(params, mesh: Mesh, min_size: int = 128,
                 exclude: FrozenSet[Tuple[str, ...]] = frozenset()):
    """PartitionSpecs for a param pytree under the mesh's 'model' axis."""
    n_model = mesh.shape["model"]

    def f(path, leaf):
        return _leaf_pspec(path, leaf, n_model, min_size, exclude)

    return jax.tree_util.tree_map_with_path(f, params)


def shard_params(params, mesh: Mesh, min_size: int = 128,
                 exclude: FrozenSet[Tuple[str, ...]] = frozenset()):
    """device_put a param pytree with TP-over-'model' shardings."""
    specs = param_pspecs(params, mesh, min_size, exclude)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
