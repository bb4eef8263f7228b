"""Cross-module style bank for G13_5 — the program-size lever VERDICT r2 #3
names "batch the per-block to_style linears across modules".

Every ModulatedConv13 in the flagship carries a private to_style stack
(Mapping13(1)+EqualizedLinear+BatchNorm1d on the shared (B, 256) latent w —
sk.py ModulatedConv13, reference generator_13_5.py:219-227). At planes=48
that is ~200 independent 5-op chains of (16, 256) matmuls per forward —
thousands of sub-50us kernels per step and a large slice of the step MLIR
(the axon compile helper SIGKILLs above ~35 MB; docs/STATUS.md r3).

The bank computes ALL site styles in one pass at the generator top:
  - one stacked (N, 256, 256) einsum + one batched BN + one PReLU
    (reusing the paired.py stacked primitives with s=N),
  - one stacked einsum + BN per distinct site width,
and hands each site its (B, c) / (S, B, c) vector down the tree as a
`sk.Precomputed` leaf in a nested dict that mirrors the module paths
(`sk.style_sub` selects the child slice at every level).

Math is identical to the per-site chains (BN is per-channel; batching
sites never mixes statistics) — pinned by
tests/test_style_bank.py::test_bank_forward_matches_classic via the
param-tree converters below.

The parameter tree CHANGES in bank mode (same leaf count/values, different
layout), so: fresh init blob, checkpoints convert via classic_to_bank /
bank_to_classic, and the default stays style_bank=False until a re-prewarm
(same rule as GAN_TPU_RIR_IMPL — g13_5.Generator13_5.rir_impl docstring).
"""

import hashlib
import json
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from gan_tpu.models import paired
from gan_tpu.models import sk

# ---------------------------------------------------------------------------
# Registry: the ordered list of style sites, derived from the CLASSIC
# (bank-off) variable structure.
# ---------------------------------------------------------------------------

_REGISTRY_MEMO = {}


def _cache_dir():
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.environ.get("GAN_TPU_COMPILE_CACHE",
                          os.path.join(repo, ".jax_cache"))


def style_registry(model) -> Tuple[Tuple[str, int, int], ...]:
    """((site_path, in_ch, mult), ...) for every ModulatedConv13 in `model`,
    in sorted-path order. site_path is '/'-joined from the generator root to
    the ModulatedConv node; mult is the stacked pair multiplicity (2 under
    the vmap/folded ResnetInit groups, else 1).

    Derived once per config via jax.eval_shape of the classic model's init
    (shape-only trace, no device work) and cached in-process and on disk —
    a flagship-scale trace costs ~a minute on this host.
    """
    classic = model.clone(style_bank=False, remat=False)
    key_fields = (type(model).__name__, model.z_dim, model.planes,
                  model.mapping_layers, model.fix_styleconv_bias,
                  "unrolled" if model.rir_impl == "unrolled" else "stacked")
    memo_key = repr(key_fields)
    if memo_key in _REGISTRY_MEMO:
        return _REGISTRY_MEMO[memo_key]

    digest = hashlib.sha256(memo_key.encode()).hexdigest()[:20]
    disk = os.path.join(_cache_dir(), f"style_registry_{digest}.json")
    if os.path.exists(disk):
        with open(disk) as f:
            reg = tuple(tuple(r) for r in json.load(f))
        _REGISTRY_MEMO[memo_key] = reg
        return reg

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    template = jax.eval_shape(
        lambda: classic.init(
            rngs, jnp.zeros((1, classic.z_dim)), train=True)
    )
    flat, _ = jax.tree_util.tree_flatten_with_path(template["params"])
    reg = []
    for path, leaf in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        if names[-2:] == ["to_style_linear", "bias"]:
            site = "/".join(names[:-2])
            c = int(leaf.shape[-1])
            mult = int(leaf.shape[0]) if len(leaf.shape) == 2 else 1
            reg.append((site, c, mult))
    reg = tuple(sorted(reg))
    assert reg, "no to_style sites found — not a G13-family style model?"
    try:
        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = disk + ".tmp"
        with open(tmp, "w") as f:
            json.dump([list(r) for r in reg], f)
        os.replace(tmp, disk)
    except OSError:
        pass
    _REGISTRY_MEMO[memo_key] = reg
    return reg


# ---------------------------------------------------------------------------
# The bank module
# ---------------------------------------------------------------------------


class StyleBank13(nn.Module):
    """Computes every site's style vector from the shared latent w in a
    handful of stacked ops. Output: nested dict (mirroring module paths)
    of sk.Precomputed leaves."""

    registry: Tuple[Tuple[str, int, int], ...]
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, w, train: bool = True):
        z = w.shape[-1]
        rows = []  # flattened (site, slot) rows, pair rows contiguous
        for i, (_, c, mult) in enumerate(self.registry):
            rows.extend([(i, c)] * mult)
        n = len(rows)

        h = jnp.broadcast_to(w[None], (n, *w.shape))  # (N, B, z)
        # identical chain to the per-site Mapping13(1, bn=True):
        # EqualizedLinear + BatchNorm1d + PReLU, stacked over sites
        h = paired.PairedMapping13(n, 1, bn=True, dtype=self.dtype,
                                   name="mapping")(h, train)

        groups = {}  # width -> row indices, in row order
        for r, (_, c) in enumerate(rows):
            groups.setdefault(c, []).append(r)

        outs = [None] * n
        for c, idxs in groups.items():
            g = len(idxs)
            hg = h[jnp.asarray(idxs)] if g < n else h  # (G, B, z)
            sg = paired.PairedEqualizedLinear(
                g, z, c, bias_init_val=1.0, dtype=self.dtype,
                name=f"linear_c{c}")(hg)
            sg = paired.PairedBN1d(g, c, dtype=self.dtype,
                                   name=f"bn_c{c}")(sg, train)
            for j, r in enumerate(idxs):
                outs[r] = sg[j]

        tree = {}
        row = 0
        for site, c, mult in self.registry:
            val = outs[row] if mult == 1 else jnp.stack(outs[row:row + mult])
            row += mult
            node = tree
            parts = site.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = sk.Precomputed(val)
        return tree


# ---------------------------------------------------------------------------
# Param-tree converters (classic <-> bank layout)
# ---------------------------------------------------------------------------

_SITE_LEAVES = {
    # bank path template -> classic relative path under the site node
    ("mapping", "EqualizedLinear_0", "kernel"):
        ("to_style_mapping", "EqualizedLinear_0", "kernel"),
    ("mapping", "EqualizedLinear_0", "bias"):
        ("to_style_mapping", "EqualizedLinear_0", "bias"),
    ("mapping", "BatchNorm1d_0", "BatchNorm_0", "scale"):
        ("to_style_mapping", "BatchNorm1d_0", "BatchNorm_0", "scale"),
    ("mapping", "BatchNorm1d_0", "BatchNorm_0", "bias"):
        ("to_style_mapping", "BatchNorm1d_0", "BatchNorm_0", "bias"),
    ("mapping", "PReLU_0", "alpha"):
        ("to_style_mapping", "PReLU_0", "alpha"),
}
_SITE_STATS = {
    ("mapping", "BatchNorm1d_0", "BatchNorm_0", "mean"):
        ("to_style_mapping", "BatchNorm1d_0", "BatchNorm_0", "mean"),
    ("mapping", "BatchNorm1d_0", "BatchNorm_0", "var"):
        ("to_style_mapping", "BatchNorm1d_0", "BatchNorm_0", "var"),
}
_LIN_LEAVES = {
    ("kernel",): ("to_style_linear", "kernel"),
    ("bias",): ("to_style_linear", "bias"),
}
_BN2_LEAVES = {
    ("BatchNorm_0", "scale"): ("to_style_bn", "BatchNorm_0", "scale"),
    ("BatchNorm_0", "bias"): ("to_style_bn", "BatchNorm_0", "bias"),
}
_BN2_STATS = {
    ("BatchNorm_0", "mean"): ("to_style_bn", "BatchNorm_0", "mean"),
    ("BatchNorm_0", "var"): ("to_style_bn", "BatchNorm_0", "var"),
}


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def _del(tree, path):
    node = tree
    for p in path[:-1]:
        node = node[p]
    del node[path[-1]]
    # prune empty parents
    for i in range(len(path) - 1, 0, -1):
        parent = _get(tree, path[:i - 1]) if i > 1 else tree
        if isinstance(parent.get(path[i - 1]), dict) and not parent[path[i - 1]]:
            del parent[path[i - 1]]


def _to_plain(d):
    try:
        import flax

        return flax.core.unfreeze(d)
    except Exception:
        return d


def classic_to_bank(variables: dict, registry, bank_name: str = "style_bank"):
    """Rearrange a classic G13_5 variable dict {params, batch_stats, ...}
    into the bank layout: per-site to_style leaves are gathered (in registry
    row order) into the bank's stacked leaves. Values preserved exactly —
    forward outputs are identical (tests/test_style_bank.py)."""
    import copy

    import numpy as np

    out = copy.deepcopy(_to_plain(variables))
    params, stats = out["params"], out.get("batch_stats", {})

    rows = []  # (site_path_tuple, slot, c)
    for site, c, mult in registry:
        for s_i in range(mult):
            rows.append((tuple(site.split("/")), s_i if mult > 1 else None, c))

    def gather(tree, rel_path, rows_subset):
        vals = []
        for site, slot, _ in rows_subset:
            leaf = np.asarray(_get(tree, site + rel_path))
            vals.append(leaf if slot is None else leaf[slot])
        return np.stack(vals)

    bank_p, bank_s = {}, {}
    for bank_path, rel in _SITE_LEAVES.items():
        _set(bank_p, bank_path, gather(params, rel, rows))
    for bank_path, rel in _SITE_STATS.items():
        _set(bank_s, bank_path, gather(stats, rel, rows))

    groups = {}
    for r in rows:
        groups.setdefault(r[2], []).append(r)
    for c, rs in groups.items():
        for bank_rel, rel in _LIN_LEAVES.items():
            _set(bank_p, (f"linear_c{c}",) + bank_rel, gather(params, rel, rs))
        for bank_rel, rel in _BN2_LEAVES.items():
            _set(bank_p, (f"bn_c{c}",) + bank_rel, gather(params, rel, rs))
        for bank_rel, rel in _BN2_STATS.items():
            _set(bank_s, (f"bn_c{c}",) + bank_rel, gather(stats, rel, rs))

    for site, c, mult in registry:
        site_t = tuple(site.split("/"))
        for rel in list(_SITE_LEAVES.values()) + list(_LIN_LEAVES.values()) \
                + list(_BN2_LEAVES.values()):
            _del(params, site_t + rel)
        for rel in list(_SITE_STATS.values()) + list(_BN2_STATS.values()):
            _del(stats, site_t + rel)

    params[bank_name] = bank_p
    if bank_s:
        stats[bank_name] = bank_s
    return out


def bank_to_classic(variables: dict, registry, bank_name: str = "style_bank"):
    """Inverse of classic_to_bank (scatter stacked bank leaves back into the
    per-site to_style sub-trees)."""
    import copy

    import numpy as np

    out = copy.deepcopy(_to_plain(variables))
    params, stats = out["params"], out.get("batch_stats", {})
    bank_p = params.pop(bank_name)
    bank_s = stats.pop(bank_name, {})

    rows = []
    for site, c, mult in registry:
        for s_i in range(mult):
            rows.append((tuple(site.split("/")), s_i if mult > 1 else None,
                         c, mult))

    def scatter(tree, rel_path, rows_subset, stacked):
        # regroup rows by site (pair rows -> one stacked leaf)
        i = 0
        while i < len(rows_subset):
            site, slot, c, mult = rows_subset[i]
            if slot is None:
                _set(tree, site + rel_path, np.asarray(stacked[i]))
                i += 1
            else:
                _set(tree, site + rel_path,
                     np.stack([np.asarray(stacked[i + j])
                               for j in range(mult)]))
                i += mult

    for bank_path, rel in _SITE_LEAVES.items():
        scatter(params, rel, rows, _get(bank_p, bank_path))
    for bank_path, rel in _SITE_STATS.items():
        scatter(stats, rel, rows, _get(bank_s, bank_path))

    groups = {}
    for r in rows:
        groups.setdefault(r[2], []).append(r)
    for c, rs in groups.items():
        for bank_rel, rel in _LIN_LEAVES.items():
            scatter(params, rel, rs, _get(bank_p, (f"linear_c{c}",) + bank_rel))
        for bank_rel, rel in _BN2_LEAVES.items():
            scatter(params, rel, rs, _get(bank_p, (f"bn_c{c}",) + bank_rel))
        for bank_rel, rel in _BN2_STATS.items():
            scatter(stats, rel, rs, _get(bank_s, (f"bn_c{c}",) + bank_rel))
    return out
