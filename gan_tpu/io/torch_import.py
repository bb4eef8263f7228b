"""Torch checkpoint importer — parity testing against the reference
(SURVEY.md SS5.4).

The reference saves whole-module pickles
{generator, discriminator, g_name, d_name, method, epoch, i}
(/root/reference/train/trainunits.py:58-76). `load_reference_ckpt` unpickles
one (the reference package must be importable — whole-module pickles are
coupled to their class definitions, one of the reference quirks SURVEY.md
SS3.5 documents) and returns the two state_dicts. `import_state_dict` maps
a torch state_dict onto a flax variables pytree.

Mapping strategy: MODULE BINDING. Torch keys are grouped into leaf modules
(registration order) with typed fields: `weight` (collapsing the
EqualizedWeight `.weight.weight` and spectral-norm
`.parametrizations.weight.original` indirections), `bias`, `mean`/`var`
(running stats), or a verbatim field name (e.g. `gamma`). Each flax parent
module binds to exactly ONE torch module — chosen as the first unbound
torch module, scanned in registration order within a window, that has the
requested field with a layout-transform-compatible shape (BN is
disambiguated from PReLU by the presence of running stats) — and all
sibling flax leaves (including `batch_stats` entries and
split-parent layouts like EqualizedConv's kernel/bias) then draw from that
same torch module's fields. This absorbs within-module registration-order
flips (reference registers a block's residual conv before its main convs,
bias before weight) that defeat pure sequence alignment, while identical
same-shape modules (attention query/key/value) keep their relative order.
A leaf with no compatible module in the window aborts with full context —
a wrong pairing never silently succeeds; the numeric forward-parity tests
(tests/test_torch_import.py) are the end check.

Known limitation: flax modules under LIFTED TRANSFORMS (nn.vmap stacked
weights — the RiR pair groups and SK fc_sub heads of the G13/G14 families)
re-order their param dicts (sorted, not call order) and stack across
sibling torch modules; the windowed scan cannot recover that mapping from
shapes alone (G14's two same-shape linears per fc_sub head alias with the
cross-head stack). Those generators' parity is covered structurally
(param counts, tests/test_zoo_parity.py) and distributionally
(tools/loss_parity*.py); per-value import coverage spans G1/G2/D1/D2/D3/
D9_2/D9_4 — including both final-thesis-adjacent discriminators.

Layout transforms (validated numerically in the tests):

  Conv kernel          (O, I/g, kh, kw) -> (kh, kw, I/g, O)
  ConvTranspose kernel (I, O, kh, kw)   -> transpose(2,3,0,1) + spatial
                                           flip (torch convT is a true
                                           convolution; flax/lax
                                           conv_transpose correlates)
  Linear kernel        (O, I)           -> (I, O)
  1-D tensors          unchanged
"""

from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

__all__ = ["load_reference_ckpt", "import_state_dict", "import_pair"]

REF_ROOT = "/root/reference"


def _ensure_reference_importable():
    import sys

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # some reference files import torchsummary at module top; stub it
    if "torchsummary" not in sys.modules:
        import types

        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub


def load_reference_ckpt(path: str):
    """Load a reference-format .pth: whole-module pickle (trainunits.py:
    61-75). Returns (g_state_dict, d_state_dict, meta).

    SECURITY: whole-module pickles EXECUTE ARBITRARY CODE on load
    (torch.load(weights_only=False) + /root/reference on sys.path is
    inherent to the reference's checkpoint format, SURVEY.md Appendix
    A.7). Only call this on checkpoints you produced yourself from the
    pinned reference tree — never on files from untrusted sources."""
    import torch

    _ensure_reference_importable()
    blob = torch.load(path, map_location="cpu", weights_only=False)
    meta = {k: blob.get(k) for k in
            ("generator_name", "discriminator_name", "method", "epoch", "i")}
    g_sd = blob["generator"].state_dict() if "generator" in blob else None
    d_sd = blob["discriminator"].state_dict() if "discriminator" in blob else None
    return g_sd, d_sd, meta


# ---------------------------------------------------------------------------


def _walk(tree, prefix=()) -> Iterator[Tuple[Tuple[str, ...], np.ndarray]]:
    """Depth-first leaves in dict-insertion order (= flax module-call
    order; deliberately NOT the sorted order tree_flatten uses)."""
    for k, v in tree.items():
        if hasattr(v, "items"):
            yield from _walk(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _transform(path: Tuple[str, ...], t: np.ndarray) -> np.ndarray:
    joined = "/".join(path)
    if t.ndim == 4:
        if "ConvTranspose" in joined:
            return np.ascontiguousarray(
                np.transpose(t, (2, 3, 0, 1))[::-1, ::-1])
        return np.transpose(t, (2, 3, 1, 0))
    if t.ndim == 2 and path[-1] in ("kernel", "weight"):
        return t.T
    return t


class _TorchModule:
    __slots__ = ("name", "order", "fields", "consumed")

    def __init__(self, name: str, order: int):
        self.name = name
        self.order = order
        self.fields: Dict[str, np.ndarray] = {}
        self.consumed: Dict[str, bool] = {}

    @property
    def done(self) -> bool:
        return all(self.consumed.values())


def _parse_torch(state_dict) -> List[_TorchModule]:
    mods: Dict[str, _TorchModule] = {}
    order = 0
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        # fixed blur kernels (Smooth) are constants in the rebuild
        if k.endswith(".kernel"):
            continue
        # spectral-norm parametrization: keep only the raw weight
        if ".parametrizations." in k and not k.endswith(".original"):
            continue
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        mod, _, field = k.rpartition(".")
        if field in ("weight", "weights") and mod.endswith(".weight"):
            mod = mod[: -len(".weight")]  # EqualizedWeight indirection
            field = "weight"              # (G14 names the param 'weights')
        elif field == "original" and mod.endswith(".parametrizations.weight"):
            mod = mod[: -len(".parametrizations.weight")]
            field = "weight"
        elif field == "running_mean":
            field = "mean"
        elif field == "running_var":
            field = "var"
        if mod not in mods:
            mods[mod] = _TorchModule(mod, order)
            order += 1
        m = mods[mod]
        m.fields[field] = arr
        m.consumed[field] = False
    return sorted(mods.values(), key=lambda m: m.order)


# flax leaf name -> torch field name
_FIELD_MAP = {
    "kernel": "weight",
    "weight": "weight",
    "bias": "bias",
    "scale": "weight",   # BN
    "alpha": "weight",   # PReLU
    "mean": "mean",
    "var": "var",
    "u": None,           # SN power-iteration state: re-estimated, not imported
}


def import_state_dict(variables: Dict, state_dict, window: int = 48,
                      debug: bool = False,
                      flatten_hints: Optional[Dict[str, Tuple[int, int, int]]]
                      = None,
                      name_hints: Optional[Dict[str, str]] = None) -> Dict:
    """Map `state_dict` (torch) onto `variables` (flax: {'params': ...,
    optionally 'batch_stats'/'spectral': ...}). Returns a new variables
    dict; raises ValueError with full context on any mis-alignment.

    flatten_hints: {flax-path-suffix: (h, w, c)} for linear layers whose
    input is a FLATTENED feature map — the rebuild flattens NHWC while
    torch flattens NCHW, so the weight's input dim must be re-indexed from
    (c,h,w) to (h,w,c) (e.g. the D9 family head: {'fc1/kernel': (2,2,257)}).

    name_hints: {flax-path-substring: torch-name-regex} constraining which
    torch modules a matching flax leaf may bind — for layouts where
    same-shape modules appear in mirrored orders on the two sides and
    shape matching alone is ambiguous (e.g. D9_4's 3x3 SE convs register
    before the identically-shaped down_sample conv that flax calls first:
    {'down_conv': 'down_sample', '/se/': r'\\.se\\.'}).
    """
    import re as _re

    modules = _parse_torch(state_dict)
    bindings: Dict[Tuple[str, ...], _TorchModule] = {}
    flatten_hints = flatten_hints or {}
    name_hints = name_hints or {}

    def name_ok(path: Tuple[str, ...], m: _TorchModule) -> bool:
        joined = "/".join(path)
        for sub, pat in name_hints.items():
            if sub in joined and not _re.search(pat, m.name):
                return False
        return True

    def post(path: Tuple[str, ...], arr: np.ndarray) -> np.ndarray:
        joined = "/".join(path)
        for suffix, (h, w, c) in flatten_hints.items():
            # exact path, or suffix match when the hint starts with '/'
            hit = (joined == suffix
                   or (suffix.startswith("/") and joined.endswith(suffix)))
            if hit and arr.ndim == 2:
                # arr is already transposed to (in, out); reindex rows
                # from torch's (c,h,w) flatten to NHWC's (h,w,c)
                o = arr.shape[1]
                return arr.reshape(c, h, w, o).transpose(1, 2, 0, 3).reshape(
                    h * w * c, o)
        return arr

    def _sub_ok(m: _TorchModule, field: str, path, want_shape) -> bool:
        if field not in m.fields or m.consumed[field]:
            return False
        if tuple(_transform(path, m.fields[field]).shape) != want_shape:
            return False
        # disambiguate 1-D weights: flax 'scale' (BatchNorm) needs a module
        # with running stats; flax 'alpha' (PReLU) needs one without
        if path[-1] == "scale" and "mean" not in m.fields:
            return False
        if path[-1] == "alpha" and "mean" in m.fields:
            return False
        return True

    def group_ok(group, field: str, path, leaf) -> bool:
        """A binding is a LIST of torch modules: len 1 for plain modules,
        len N for an nn.vmap-stacked flax module whose leading axis stacks
        N torch modules (e.g. the m SK fc_sub heads)."""
        shape = tuple(np.shape(leaf))
        if len(group) == 1:
            return _sub_ok(group[0], field, path, shape)
        if not shape or shape[0] != len(group):
            return False
        return all(_sub_ok(m, field, path, shape[1:]) for m in group)

    def draw(group, field, path):
        for m in group:
            m.consumed[field] = True
        if len(group) == 1:
            arr = _transform(path, group[0].fields[field])
        else:
            arr = np.stack(
                [_transform(path, m.fields[field]) for m in group])
        if debug:
            names = "+".join(m.name for m in group)
            print(f"  {'/'.join(path)} <- {names}.{field}")
        return post(path, arr)

    def resolve(path: Tuple[str, ...], leaf) -> np.ndarray:
        name = path[-1]
        field = _FIELD_MAP.get(name, name)
        if field is None:
            return np.asarray(leaf)  # keep flax initialization
        parent = path[:-1]
        # 1. a group already bound to this parent or a nested/enclosing
        #    parent (EqualizedConv keeps bias one level above its kernel)
        for fp, group in bindings.items():
            rel = (fp[: len(parent)] == parent) or (parent[: len(fp)] == fp)
            if rel and group_ok(group, field, path, leaf):
                return draw(group, field, path)
        # 2. first unbound torch module(s) (registration order, windowed)
        bound = set()
        for g in bindings.values():
            bound.update(id(m) for m in g)
        shape = tuple(np.shape(leaf))
        want_2d = np.ndim(leaf) >= 2

        def scan(want_shape, want_2d_):
            seen = 0
            out = []
            for m in modules:
                if m.done or id(m) in bound or id(m) in (id(o) for o in out):
                    continue
                # the window counts only modules OFFERING this field at a
                # compatible dimensionality — e.g. PReLU modules (1-D
                # weight, one after every conv in D9_4) must not eat the
                # lookahead for a conv-kernel request
                f_arr = m.fields.get(field)
                if f_arr is None or m.consumed.get(field, True) \
                        or (f_arr.ndim >= 2) != want_2d_:
                    continue
                if not name_ok(path, m):
                    continue
                seen += 1
                if seen > window:
                    return out, False
                if _sub_ok(m, field, path, want_shape):
                    out.append(m)
                    return out, True
            return out, False

        group, hit = scan(shape, want_2d)
        if hit:
            bindings[parent] = group
            return draw(group, field, path)
        # stacked attempt: leading axis = N stacked torch modules
        if shape and 1 < shape[0] <= 8:
            sub_2d = len(shape[1:]) >= 2
            group = []
            for _ in range(shape[0]):
                found, hit = scan(shape[1:], sub_2d)
                if not hit:
                    group = None
                    break
                group.extend(found)
                bound.update(id(m) for m in found)
            if group is not None:
                bindings[parent] = group
                return draw(group, field, path)
        avail = [(m.name, {f: tuple(a.shape) for f, a in m.fields.items()
                           if not m.consumed[f]})
                 for m in modules if not m.done][:6]
        raise ValueError(
            f"no torch module provides field '{field}' for flax "
            f"{'/'.join(path)} shape {tuple(np.shape(leaf))}; "
            f"unconsumed: {avail}"
        )

    by_order = {m.order: m for m in modules}

    def adjacency_candidate(leaves, i):
        """For a PReLU alpha at walk index i: torch registers the PReLU
        right AFTER the module it activates, but flax may CALL later
        modules' params earlier (e.g. D9_4's act3 is used before se yet
        registered after it upstream). The registration neighbor of the
        nearest preceding bound sibling is the right candidate."""
        for j in range(i - 1, -1, -1):
            pj = leaves[j][0][:-1]
            group = bindings.get(pj)
            if group is None or len(group) != 1:
                continue
            cand = by_order.get(group[0].order + 1)
            if cand is None:
                return None
            w = cand.fields.get("weight")
            if (w is not None and not cand.consumed["weight"]
                    and w.ndim == 1 and "mean" not in cand.fields):
                return cand
            return None
        return None

    def consume(tree):
        leaves = list(_walk(tree))
        mapped = {}
        # pass 1 — BINDING pass: >=2-D kernels are shape-discriminative, so
        # they pick the torch module; 1-D leaves (bias/scale/alpha, which
        # some flax modules register BEFORE their kernel) are deferred and
        # drawn from the bound module in pass 2.
        for path, v in leaves:
            if np.ndim(v) >= 2 and _FIELD_MAP.get(path[-1], path[-1]) == "weight":
                mapped[path] = resolve(path, v)
        for i, (path, v) in enumerate(leaves):
            if path in mapped:
                continue
            if path[-1] == "alpha" and np.ndim(v) == 1:
                cand = adjacency_candidate(leaves, i)
                if cand is not None and tuple(
                        cand.fields["weight"].shape) == tuple(np.shape(v)):
                    cand.consumed["weight"] = True
                    bindings[path[:-1]] = [cand]
                    if debug:
                        print(f"  {'/'.join(path)} <- {cand.name}.weight (adj)")
                    mapped[path] = cand.fields["weight"]
                    continue
            mapped[path] = resolve(path, v)

        def rebuild(sub, prefix=()):
            new = {}
            for k, v in sub.items():
                if hasattr(v, "items"):
                    new[k] = rebuild(v, prefix + (k,))
                else:
                    new[k] = np.asarray(mapped[prefix + (k,)],
                                        dtype=np.asarray(v).dtype)
            return new

        return rebuild(tree)

    variables = {k: dict(v) if hasattr(v, "items") else v
                 for k, v in dict(variables).items()}
    new_vars = dict(variables)
    new_vars["params"] = consume(variables["params"])
    if "batch_stats" in variables:
        new_vars["batch_stats"] = consume(variables["batch_stats"])
    leftovers = [
        f"{m.name}.{f}" for m in modules for f, c in m.consumed.items() if not c
    ]
    if leftovers:
        raise ValueError(f"unconsumed torch tensors: {leftovers[:10]}"
                         f" (+{max(0, len(leftovers) - 10)} more)")
    return new_vars


def import_pair(g_model, d_model, g_sd, d_sd, batch_size=4,
                image_size=(64, 64, 3), seed=0):
    """Init both flax models and overwrite with torch weights."""
    import jax
    import jax.numpy as jnp

    rngs = {"params": jax.random.PRNGKey(seed),
            "noise": jax.random.PRNGKey(seed + 1)}
    g_vars = dict(g_model.init(
        rngs, jnp.zeros((batch_size, g_model.z_dim)), train=True))
    d_vars = dict(d_model.init(
        rngs, jnp.zeros((batch_size, *image_size)), train=True,
        update_sn=False))
    if g_sd is not None:
        g_vars = import_state_dict(g_vars, g_sd)
    if d_sd is not None:
        d_vars = import_state_dict(d_vars, d_sd)
    return g_vars, d_vars
