"""Name-directed torch importer for G8 (the SkipTreeGenerator spine shared
by G9/G10/G10_2/G11 — importing G8 value-for-value certifies the stage-skip
concat, RiR vmap stacks, SE gating and DLA tree wiring of the whole family).

The generic windowed importer (io/torch_import.py) cannot map the nn.vmap
RiR pair stacks (``group_dd``/``group_nodd``); this translator turns every
flax path into its exact torch state_dict key, the same approach as
io/torch_import_g13.py.

Reference layout (/root/reference/generators/generator_8.py):
  Generator.Upsample_k = Sequential(Sequential(ConvT, BN, PReLU))  :199-204,230-244
  Generator.Tree_k = Sequential(Tree)                              :213,219,225,231
  Generator.LastConv                                               :246
  Tree: prev_root / level_i / block_i / root                       :128-176
  BasicBlock: unify (Sequential Conv,BN) / rir_3 / rir_5 / rir_7 /
    shortcut (Sequential Conv,BN, root only)                       :69-110
  ResnetInit: residual / transient / residual_across /
    transient_across                                               :41-53
  SqueezeExcitationBottleneck.res = Sequential(Conv,BN,PReLU,
    depthwiseConv,BN,PReLU,Conv,BN); .se = Sequential(AvgPool,Conv,
    PReLU,Conv,Sigmoid)                                            :8-28

Flax-side module naming (gan_tpu/models/{generators/g08.py,blocks_rir.py}):
  _Upsample_i / Tree_k / Conv_0(LastConv); trees use the same
  prev_root/level_i/block_i/root names; RiR fused=True stacks the four
  SE bottlenecks as two nn.vmap pairs: group_dd=(residual,
  transient_across), group_nodd=(residual_across, transient).
"""

import re
from typing import Dict, List, Tuple

import numpy as np

__all__ = ["import_g8", "import_d6", "translate_g8_path",
           "translate_d6_path"]

# vmap stack component -> ordered torch attribute names (axis order =
# blocks_rir.RiR fused stacking: pair=(x_res, x_tra); group_dd applied to
# pair gives (residual(x_res), transient_across(x_tra)), group_nodd gives
# (residual_across(x_res), transient(x_tra)))
_GROUP_STACKS = {
    "group_dd": ("residual", "transient_across"),
    "group_nodd": ("residual_across", "transient"),
}

# SEBottleneck internals: flax auto-name -> torch Sequential index
_SE_RES = {
    "_Conv_0": "res.0", "_Norm_0": "res.1", "_Act_0": "res.2",
    "_Conv_1": "res.3", "_Norm_1": "res.4", "_Act_1": "res.5",
    "_Conv_2": "res.6", "_Norm_2": "res.7",
    "_Conv_3": "se.1", "_Act_2": "se.2", "_Conv_4": "se.3",
}

_UPS = re.compile(r"^_Upsample_(\d+)$")
_TREE = re.compile(r"^Tree_(\d+)$")


def translate_g8_path(comps: Tuple[str, ...], leaf: str
                      ) -> Tuple[List[Tuple[Tuple[int, ...], str]], str]:
    """One flax path -> ([(stack_index, torch_key_prefix)], terminal kind).
    terminal in {'conv', 'convT', 'bn', 'prelu', 'linear'} decides the
    leaf-field name + layout transform."""
    outs: List[Tuple[Tuple[int, ...], List[str]]] = [((), [])]
    term = None
    in_block = None  # nearest tree-block name ('root'/'block_i'/...)

    def emit(part: str):
        for _, parts in outs:
            parts.append(part)

    i = 0
    while i < len(comps):
        c = comps[i]
        m_u, m_t = _UPS.match(c), _TREE.match(c)
        if m_u:
            emit(f"Upsample_{int(m_u.group(1)) + 1}.0")
        elif m_t:
            emit(f"Tree_{m_t.group(1)}.0")
        elif c == "Conv_0" and i == 0:
            emit("LastConv")
            term = "conv"
            i = len(comps)
            break
        elif c in ("prev_root", "root") or c.startswith(("level_", "block_")):
            emit(c)
            in_block = c
        elif c in _GROUP_STACKS:
            outs = [
                (ix + (j,), parts + [name])
                for ix, parts in outs
                for j, name in enumerate(_GROUP_STACKS[c])
            ]
        elif c.startswith("rir_"):
            emit(c)
        elif c in _SE_RES and any(g in comps for g in _GROUP_STACKS):
            emit(_SE_RES[c])
            term = ("bn" if c.startswith("_Norm")
                    else "prelu" if c.startswith("_Act") else "conv")
            i = len(comps) - 1  # remaining comps are core-wrapper inners
            break
        elif c == "_Conv_0":
            # block-level 1x1+BN: torch 'shortcut' on the root block,
            # 'unify' elsewhere (generator_8.py:85-93,104-109)
            emit("shortcut.0" if in_block == "root" else "unify.0")
            term = "conv"
            i = len(comps) - 1
            break
        elif c == "_Norm_0":
            emit("shortcut.1" if in_block == "root" else "unify.1")
            term = "bn"
            i = len(comps) - 1
            break
        elif c == "ConvTranspose_0":
            emit("0")
            term = "convT"
            i = len(comps) - 1
            break
        elif c == "BatchNorm_0":
            emit("1")
            term = "bn"
            i = len(comps) - 1
            break
        elif c == "PReLU_0":
            emit("2")
            term = "prelu"
            i = len(comps) - 1
            break
        else:
            raise KeyError(f"unexpected component {c!r} in {comps}")
        i += 1

    field = {
        ("conv", "kernel"): "weight", ("conv", "bias"): "bias",
        ("convT", "kernel"): "weight", ("convT", "bias"): "bias",
        ("bn", "scale"): "weight", ("bn", "bias"): "bias",
        ("bn", "mean"): "running_mean", ("bn", "var"): "running_var",
        ("prelu", "alpha"): "weight",
    }.get((term, leaf))
    if field is None:
        raise KeyError(f"no leaf mapping for {term}/{leaf} at {comps}")
    return [
        (ix, ".".join(parts + [field])) for ix, parts in outs
    ], term


_UPS_D6 = re.compile(r"^Downsample_(\d+)$")

# D6 variant (discriminator_6_wgangp.py): LeakyReLU instead of PReLU and
# no BatchNorm, so only the convs carry params and the Sequential indices
# shift: res = Conv(0), LReLU, Conv(2), LReLU, Conv(4); se = AvgPool,
# Conv(1), LReLU, Conv(3), Sigmoid.
_SE_RES_D6 = {
    "_Conv_0": "res.0", "_Conv_1": "res.2", "_Conv_2": "res.4",
    "_Conv_3": "se.1", "_Conv_4": "se.3",
}


def translate_d6_path(comps: Tuple[str, ...], leaf: str
                      ) -> Tuple[List[Tuple[Tuple[int, ...], str]], str]:
    """D6_wgangp flax path -> torch keys under the 'model.' Sequential
    (discriminator_6_wgangp.py:196-221). Tree internals share the G8
    translator's structure with the D6 param-index maps."""
    outs: List[Tuple[Tuple[int, ...], List[str]]] = [((), [])]
    in_block = None

    def emit(part: str):
        for _, parts in outs:
            parts.append(part)

    term = "conv"  # every D6 param is a conv weight/bias
    i = 0
    while i < len(comps):
        c = comps[i]
        m_d, m_t = _UPS_D6.match(c), _TREE.match(c)
        if m_d:
            emit(f"model.Downsample_{m_d.group(1)}.0")
            break
        elif m_t:
            emit(f"model.Tree_{m_t.group(1)}")
        elif c == "LastConv":
            emit("model.LastConv")
            break
        elif c in ("prev_root", "root") or c.startswith(("level_", "block_")):
            emit(c)
            in_block = c
        elif c in _GROUP_STACKS:
            outs = [
                (ix + (j,), parts + [name])
                for ix, parts in outs
                for j, name in enumerate(_GROUP_STACKS[c])
            ]
        elif c.startswith("rir_"):
            emit(c)
        elif c in _SE_RES_D6 and any(g in comps for g in _GROUP_STACKS):
            emit(_SE_RES_D6[c])
            break
        elif c == "_Conv_0":
            # block-level 1x1 (no BN in D6): unify / root shortcut
            emit("shortcut.0" if in_block == "root" else "unify.0")
            break
        else:
            raise KeyError(f"unexpected component {c!r} in {comps}")
        i += 1

    field = {"kernel": "weight", "bias": "bias"}.get(leaf)
    if field is None:
        raise KeyError(f"no leaf mapping for {leaf} at {comps}")
    return [
        (ix, ".".join(parts + [field])) for ix, parts in outs
    ], term


def _layout(t: np.ndarray, term: str) -> np.ndarray:
    if t.ndim != 4:
        return t
    if term == "convT":  # torch (in, out, kh, kw) -> flax flipped (k,k,in,out)
        return np.ascontiguousarray(np.transpose(t, (2, 3, 0, 1))[::-1, ::-1])
    # torch (out, in/groups, kh, kw) -> flax (k,k,in/g,out)
    return np.transpose(t, (2, 3, 1, 0))


def import_g8(variables: Dict, state_dict) -> Dict:
    """Map a reference G8 state_dict onto the flax variables pytree
    (RiR fused=vmap layout). Verifies exhaustive consumption."""
    return _import_named(variables, state_dict, translate_g8_path)


def import_d6(variables: Dict, state_dict) -> Dict:
    """Map a reference D6_wgangp state_dict onto the flax variables
    pytree (gan_tpu/models/discriminators/d06.py)."""
    return _import_named(variables, state_dict, translate_d6_path)


def _import_named(variables: Dict, state_dict, translate) -> Dict:
    tensors = {}
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
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
            entries, term = translate(prefix, k)
            arr = np.asarray(v)
            if len(entries[0][0]) == 0:
                (_, key), = entries
                if key not in tensors:
                    raise KeyError(f"missing torch key {key} for "
                                   f"{'/'.join(prefix)}/{k}")
                out = _layout(tensors[key], term)
                consumed.add(key)
            else:
                out = np.zeros(arr.shape, dtype=np.float32)
                for ix, key in entries:
                    if key not in tensors:
                        raise KeyError(f"missing torch key {key} for "
                                       f"{'/'.join(prefix)}/{k} [{ix}]")
                    out[ix] = _layout(tensors[key], term)
                    consumed.add(key)
            if out.shape != arr.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(prefix)}/{k}: "
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
