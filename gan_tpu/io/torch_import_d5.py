"""Name-directed torch importer for the D5 RiR critic (D5_wgangp).

Reference layout (/root/reference/discriminators/discriminator_5_wgangp.py):
  Discriminator.residual_pre_conv / transient_pre_conv =
    Sequential(Conv2d, LeakyReLU)                               :64-71
  Discriminator.rir{1..8} = RiRBlock;
    RiRBlock.resnetinit = Sequential of ResnetInit modules named
    "generalized layers{j}" (note the SPACE in the name)        :43-58
  ResnetInit: residual_stream_conv / transient_stream_conv /
    residual_stream_conv_across / transient_stream_conv_across /
    short_cut (Sequential(Conv1x1) when shape changes)          :6-26
  Discriminator.conv1 = Sequential(Conv4x4, LeakyReLU, Conv1x1) :82-86

Flax side (gan_tpu/models/discriminators/d05.py) mirrors the stream-conv
names exactly; blocks are rir{i}/layer_{j}; head convs are the two
auto-named Conv_0/Conv_1.
"""

from typing import Dict

import numpy as np

__all__ = ["import_d5_wgangp"]


def _torch_key(prefix, leaf) -> str:
    # strip the core.Conv wrapper's inner auto-name
    p = list(prefix)
    if len(p) > 1 and p[-1] == "Conv_0":
        p = p[:-1]
    top = p[0]
    if top in ("residual_pre_conv", "transient_pre_conv"):
        base = f"{top}.0"
    elif top.startswith("rir"):
        j = p[1].split("_")[1]
        name = p[2]
        base = f"{top}.resnetinit.generalized layers{j}.{name}"
        if name == "short_cut":
            base += ".0"
    elif top == "Conv_0":
        base = "conv1.0"
    elif top == "Conv_1":
        base = "conv1.2"
    else:
        raise KeyError(f"unexpected flax component {top!r} in {prefix}")
    return base + "." + {"kernel": "weight", "bias": "bias"}[leaf]


def import_d5_wgangp(variables: Dict, state_dict) -> Dict:
    tensors = {k: (v.detach().cpu().numpy() if hasattr(v, "detach")
                   else np.asarray(v)) for k, v in state_dict.items()}
    consumed = set()

    def walk(tree, prefix=()):
        new = {}
        for k, v in tree.items():
            if hasattr(v, "items"):
                new[k] = walk(v, prefix + (k,))
                continue
            key = _torch_key(prefix, k)
            if key not in tensors:
                raise KeyError(f"missing torch key {key} for "
                               f"{'/'.join(prefix)}/{k}")
            t = tensors[key]
            consumed.add(key)
            arr = np.asarray(v)
            out = np.transpose(t, (2, 3, 1, 0)) if t.ndim == 4 else t
            if out.shape != arr.shape:
                raise ValueError(
                    f"shape mismatch at {'/'.join(prefix)}/{k}: "
                    f"flax {arr.shape} vs torch-mapped {out.shape}")
            new[k] = out.astype(arr.dtype)
        return new

    new_vars = dict(variables)
    new_vars["params"] = walk(variables["params"])
    leftovers = sorted(set(tensors) - consumed)
    if leftovers:
        raise ValueError(
            f"unconsumed torch tensors ({len(leftovers)}): {leftovers[:8]}")
    return new_vars
