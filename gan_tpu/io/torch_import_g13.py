"""Name-directed torch importer for the G13-family generators.

The generic importer (io/torch_import.py) binds flax leaves to torch
modules by registration order + shape within a window. That cannot recover
the two nn.vmap-stacked layouts of the G13/G14 families (VERDICT r2
missing #2):

- ``fc_subs``: the m SK per-branch heads run as ONE vmap'd module whose
  leading axis stacks torch's ``fc_sub_0 .. fc_sub_{m-1}`` — and lifted
  scopes re-order their children (sorted, not call order), so the outer
  EqualizedLinear (torch ``fc_sub_i.3``) walks BEFORE the inner mapping
  linear (``fc_sub_i.0``) with an identical (C, C) shape.
- ``group_dd`` / ``group_nodd``: ResnetInit's four StyleBlocks run as two
  vmap'd pairs; ``group_dd`` stacks torch (residual, transient_across),
  ``group_nodd`` stacks (residual_across, transient) — same shapes, only
  names disambiguate (torch registers residual, transient,
  residual_across, transient_across: /root/reference/generators/
  generator_13_5.py:324-336).

Fortunately the rebuild's module names mirror the reference's attribute
names almost 1:1 (conv1/conv3/skconv/sk_attention/fc_sub/unify/shortcut/
root/prev_root/level_i/block_i/to_rgb/upsample...), so this importer
TRANSLATES each flax leaf path into its exact torch state_dict key (a
deterministic state machine over path components — no scanning, no shape
ambiguity) and verifies every torch tensor is consumed exactly once.

Reference layout anchors:
  Conv2dWeightModulate.to_style = Sequential(MappingNetwork(1),
    EqualizedLinear, BatchNorm1d)            generator_13_5.py:220-227
  MappingNetwork.net = Sequential([EqLinear, BN1d, PReLU] * n)  :206-215
  SKAttention_conv: conv_main / fc_main / fc_sub_i              :41-89
  SEBlock_conv: convs / fcs / fc_out / fc_bn                    :352-381
  SKConvT: convT / bn / activation_convT / smooth / sk_attention :154-170
  ToRGB: pre_conv / pre_bn / pre_activation / skconv / conv / bn :471-493
  Tree: prev_root / level_i / block_i / root / to_rgb           :500-546
  GeneratorStart: mapping_network/convT/bn/activation/to_rgb/tree :586-607
"""

import re
from itertools import product
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["import_g13_5", "translate_g13_path"]

# vmap stack component -> ordered torch attribute names (axis order =
# gan_tpu/models/generators/g13_5.py:171-181 stacking order)
_GROUP_STACKS = {
    "group_dd": ("residual", "transient_across"),
    "group_nodd": ("residual_across", "transient"),
}

_IDX = re.compile(r"^(.*)_(\d+)$")


def _split_idx(comp: str) -> Tuple[str, int]:
    m = _IDX.match(comp)
    return (m.group(1), int(m.group(2))) if m else (comp, 0)


def translate_g13_path(comps: Tuple[str, ...], leaf: str,
                       m: int = 2) -> List[Tuple[Tuple[int, ...], str]]:
    """Translate one flax path (component tuple, leaf name) into
    [(stack_index_tuple, torch_key), ...]. Non-stacked leaves return a
    single entry with index ()."""
    outs: List[Tuple[Tuple[int, ...], List[str]]] = [((), [])]
    term = None  # terminal module kind, decides the leaf-field suffix
    i = 0

    def emit(part: str):
        for _, parts in outs:
            parts.append(part)

    while i < len(comps):
        c = comps[i]
        base, idx = _split_idx(c)
        nxt = comps[i + 1] if i + 1 < len(comps) else None

        if c in _GROUP_STACKS:  # ResnetInit vmap pair
            outs = [
                (ix + (j,), parts + [name])
                for ix, parts in outs
                for j, name in enumerate(_GROUP_STACKS[c])
            ]
        elif c == "fc_subs":  # SK heads vmap stack
            outs = [
                (ix + (j,), parts + [f"fc_sub_{j}"])
                for ix, parts in outs
                for j in range(m)
            ]
            term = "fcsub"
        elif c == "mapping_network":
            emit("block0.mapping_network.net" if i == 0
                 else "mapping_network.net")
            term = "seq3"
        elif c == "start_convT":
            emit("block0.convT")
            i += 1  # consume core wrapper 'ConvTranspose_0'
            term = "convT"
        elif c == "start_bn":
            emit("block0.bn")
            i += 1  # consume inner 'BatchNorm_0'
            term = "bn"
        elif c == "start_activation":
            emit("block0.activation")
            term = "prelu"
        elif c == "start_to_rgb":
            emit("block0.to_rgb")
            term = "torgb"
        elif c == "start_tree":
            emit("block0.tree")
        elif term == "seq3":
            # inside a [EqLinear, BN1d, PReLU]*n Sequential
            if base == "EqualizedLinear":
                emit(f"{3 * idx}")
                term = "eq"
            elif base == "BatchNorm1d":
                emit(f"{3 * idx + 1}")
                i += 1  # inner 'BatchNorm_0'
                term = "bn"
            elif base == "PReLU":
                emit(f"{3 * idx + 2}")
                term = "prelu"
            else:
                raise KeyError(f"seq3 ctx: unexpected {c} in {comps}")
        elif term == "fcsub":
            # _FCSub (V13_5): Mapping13_0 -> indices 0..2, outer
            # EqualizedLinear_0 -> index 3 (generator_13_5.py:62-68)
            if c == "Mapping13_0":
                term = "seq3"  # indices land at 0,1,2 relative to fc_sub_j
            elif c == "EqualizedLinear_0":
                emit("3")
                term = "eq"
            else:
                raise KeyError(f"fcsub ctx: unexpected {c} in {comps}")
        elif term == "skatt":
            # SKAttention_conv/_fc trunk (generator_13_5.py:41-131)
            if base == "EqualizedConvRep":
                emit(f"conv_main.{3 * idx}")
                term = "eq"
            elif base == "BatchNorm" and nxt == "BatchNorm_0":
                emit(f"conv_main.{3 * idx + 1}")
                i += 1
                term = "bn"
            elif base == "PReLU":
                emit(f"conv_main.{3 * idx + 2}")
                term = "prelu"
            elif c == "Mapping13_0":
                emit("fc_main")
                term = "seq3"
            else:
                raise KeyError(f"skatt ctx: unexpected {c} in {comps}")
        elif term == "se":
            # SEBlock_conv/_fc (generator_13_5.py:352-405)
            if base == "EqualizedConvRep":
                emit(f"convs.{3 * idx}")
                term = "eq"
            elif base == "BatchNorm" and nxt == "BatchNorm_0":
                emit(f"convs.{3 * idx + 1}")
                i += 1
                term = "bn"
            elif base == "PReLU":
                emit(f"convs.{3 * idx + 2}")
                term = "prelu"
            elif c == "Mapping13_0":
                emit("fcs")
                term = "seq3"
            elif c == "EqualizedLinear_0":
                emit("fc_out")
                term = "eq"
            elif c == "fc_bn":
                emit("fc_bn")
                i += 1  # inner 'BatchNorm_0'
                term = "bn"
            else:
                raise KeyError(f"se ctx: unexpected {c} in {comps}")
        elif term == "skconvt":
            # SKConvT (generator_13_5.py:154-170)
            if c == "ConvTranspose_0":
                emit("convT")
                i += 1  # inner 'ConvTranspose_0'
                term = "convT"
            elif c == "BatchNorm_0" and nxt == "BatchNorm_0":
                emit("bn")
                i += 1
                term = "bn"
            elif c == "PReLU_0":
                emit("activation_convT")
                term = "prelu"
            elif c == "sk_attention":
                emit("sk_attention")
                term = "skatt"
            else:
                raise KeyError(f"skconvt ctx: unexpected {c} in {comps}")
        elif term == "torgb":
            if c == "pre_conv":
                emit("pre_conv")
                term = "eq"
            elif c in ("pre_bn", "bn"):
                emit(c)
                i += 1  # inner 'BatchNorm_0'
                term = "bn"
            elif c == "pre_activation":
                emit("pre_activation")
                term = "prelu"
            elif c == "skconv":
                emit("skconv")
                term = "skplain"
            elif c == "conv":
                emit("conv")
                term = "eq"
            else:
                raise KeyError(f"torgb ctx: unexpected {c} in {comps}")
        elif term == "skplain":
            # non-style SKConv (generator_13_5.py:173-202)
            if base == "conv":
                emit(c)
                term = "eq"
            elif base == "BatchNorm" and nxt == "BatchNorm_0":
                emit(f"BatchNorm_{idx}")
                i += 1
                term = "bn"
            elif base == "nonlinear":
                emit(c)
                term = "prelu"
            elif c == "sk_attention":
                emit("sk_attention")
                term = "skatt"
            else:
                raise KeyError(f"skplain ctx: unexpected {c} in {comps}")
        elif term == "modconv":
            # Conv2dWeightModulate (generator_13_5.py:219-249)
            if c == "to_style_mapping":
                emit("to_style.0.net")
                term = "seq3"
            elif c == "to_style_linear":
                emit("to_style.1")
                term = "eq"
            elif c == "to_style_bn":
                emit("to_style.2")
                i += 1  # inner 'BatchNorm_0'
                term = "bn"
            else:
                raise KeyError(f"modconv ctx: unexpected {c} in {comps}")
        elif term == "styleconv" and c == "conv":
            emit("conv")  # StyleConv.conv = Conv2dWeightModulate (:252-266)
            term = "modconv"
        elif c in ("conv1", "conv2", "conv3"):
            emit(c)
            term = "styleconv"
        elif term == "skstyle":
            # SKStyleConv (generator_13_5.py:269-295)
            if base == "conv":
                emit(c)
                term = "styleconv"
            elif base == "nonlinear":
                emit(c)
                term = "prelu"
            elif c == "sk_attention":
                emit("sk_attention")
                term = "skatt"
            else:
                raise KeyError(f"skstyle ctx: unexpected {c} in {comps}")
        elif c == "skconv":
            emit("skconv")
            term = "skstyle"
        elif c == "sk_attention":
            emit("sk_attention")
            term = "skatt"
        elif c == "se_attention_residual":
            emit("se_attention_residual")
            term = "se"
        elif c in ("upsample", "upsample_rgb"):
            emit(c)
            term = "skconvt"
        elif c == "to_rgb":
            emit("to_rgb")
            term = "torgb"
        elif base == "activation" or c in (
                "activation1", "activation2", "activation_unify",
                "activation_shortcut", "activation_residual",
                "activation_transient"):
            emit(c)
            term = "prelu"
        elif c in ("unify", "shortcut", "residual", "residual_across",
                   "transient", "transient_across"):
            emit(c)  # StyleBlock: children conv1/activation1/skconv/conv3
        elif c in ("tree", "root", "prev_root", "rir_3") or base in (
                "block", "level") or re.match(r"^block\d+$", c):
            emit(c)
        else:
            raise KeyError(
                f"no rule for component {c!r} (ctx {term}) in {comps}")
        i += 1

    # leaf-field suffix by terminal module kind
    if term in ("eq", "modconv", "styleconv"):
        field = {"kernel": "weight.weights", "weight": "weight.weights",
                 "bias": "bias", "scale_noise": "scale_noise"}[leaf]
    elif term == "bn":
        field = {"scale": "weight", "bias": "bias",
                 "mean": "running_mean", "var": "running_var"}[leaf]
    elif term == "prelu":
        field = {"alpha": "weight"}[leaf]
    elif term == "convT":
        field = {"kernel": "weight", "bias": "bias"}[leaf]
    else:
        raise KeyError(f"leaf {leaf!r} with terminal {term} in {comps}")
    return [(ix, ".".join(parts) + "." + field) for ix, parts in outs]


def _layout(path_comps: Tuple[str, ...], leaf: str, t: np.ndarray,
            conv_transpose: bool) -> np.ndarray:
    """torch -> flax layout (same transforms io/torch_import.py uses,
    selected by the translator's terminal kind instead of name sniffing)."""
    if t.ndim == 4:
        if conv_transpose:
            return np.ascontiguousarray(
                np.transpose(t, (2, 3, 0, 1))[::-1, ::-1])
        return np.transpose(t, (2, 3, 1, 0))
    if t.ndim == 2 and leaf in ("kernel", "weight"):
        return t.T
    return t


def import_g13_5(variables: Dict, state_dict, m: int = 2) -> Dict:
    """Map a reference G13_5 state_dict onto the flax variables pytree
    (default rir_impl='vmap' layout). Verifies exhaustive consumption."""
    tensors = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith(".kernel"):  # Smooth blur: fixed constant upstream
            continue
        tensors[k] = (v.detach().cpu().numpy()
                      if hasattr(v, "detach") else np.asarray(v))
    consumed = set()

    def walk(tree, prefix=()):
        new = {}
        for k, v in tree.items():
            if hasattr(v, "items"):
                new[k] = walk(v, prefix + (k,))
                continue
            path, leaf = prefix, k
            m_val = m
            if "fc_subs" in path:
                # the vmap stack size varies by site (m=1 in start_tree
                # stages, m=2 elsewhere): read it off the leaf itself —
                # group stacks (if any) occupy the leading dims before it
                gpos = sum(1 for c in path if c in _GROUP_STACKS)
                m_val = int(np.asarray(v).shape[gpos])
            entries = translate_g13_path(path, leaf, m=m_val)
            is_convt = any("convT" in key for _, key in entries)
            arr = np.asarray(v)
            n_stack = len(entries[0][0])
            if n_stack == 0:
                (_, key), = entries
                if key not in tensors:
                    raise KeyError(f"missing torch key {key} for "
                                   f"{'/'.join(path)}/{leaf}")
                out = _layout(path, leaf, tensors[key], is_convt)
                consumed.add(key)
            else:
                out = np.zeros(arr.shape, dtype=np.float32)
                for ix, key in entries:
                    if key not in tensors:
                        raise KeyError(f"missing torch key {key} for "
                                       f"{'/'.join(path)}/{leaf} [{ix}]")
                    out[ix] = _layout(path, leaf, tensors[key], is_convt)
                    consumed.add(key)
            if out.shape != arr.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}/{leaf}: "
                    f"flax {arr.shape} vs torch-mapped {out.shape}")
            new[k] = out.astype(arr.dtype)
        return new

    new_vars = dict(variables)
    new_vars["params"] = walk(variables["params"])
    if "batch_stats" in variables:
        new_vars["batch_stats"] = walk(variables["batch_stats"])
    leftovers = sorted(set(tensors) - consumed)
    if leftovers:
        raise ValueError(
            f"unconsumed torch tensors ({len(leftovers)}): {leftovers[:8]}")
    return new_vars
