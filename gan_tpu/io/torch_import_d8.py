"""Name-directed torch importer for D8 (labml StyleGAN2 discriminator).

Reference layout (/root/reference/discriminators/discriminator_8.py):
  Discriminator.from_rgb = Sequential(EqualizedConv2d, LeakyReLU)  :288-291
  Discriminator.blocks = Sequential(DiscriminatorBlock * n)        :299-301
  DiscriminatorBlock.residual = Sequential(DownSample,
    EqualizedConv2d); .block = Sequential(Conv, LReLU, Conv, LReLU) :162-171
  Discriminator.conv / .final                                      :308-310
  EqualizedConv2d.weight = EqualizedWeight (key '...weight.weight') :98
  Smooth.kernel: fixed blur constant (requires_grad=False)         :30

Flax side (gan_tpu/models/discriminators/d08.py): from_rgb, block_i
{residual_conv, conv1, conv2}, conv, final — explicit names, direct map.

The one non-trivial transform: ``final`` flattens the 2x2 feature map.
torch flattens (B, C, 2, 2) channel-major; flax flattens (B, 2, 2, C)
spatial-major — the fan-in axis of the final linear weight must be
re-ordered (reshape (out, C, H, W) -> (H, W, C, out) -> (H*W*C, out)).
"""

from typing import Dict

import numpy as np

__all__ = ["import_d8"]


def import_d8(variables: Dict, state_dict, head_hw=(2, 2)) -> Dict:
    tensors = {}
    for k, v in state_dict.items():
        if k.endswith("smooth.kernel"):  # fixed blur constant
            continue
        tensors[k] = (v.detach().cpu().numpy()
                      if hasattr(v, "detach") else np.asarray(v))
    consumed = set()

    def torch_key(prefix, leaf) -> str:
        name = prefix[0]
        if name == "from_rgb":
            base = "from_rgb.0"
        elif name.startswith("block_"):
            i = int(name.split("_")[1])
            sub = {"residual_conv": "residual.1",
                   "conv1": "block.0",
                   "conv2": "block.2"}[prefix[1]]
            base = f"blocks.{i}.{sub}"
        elif name in ("conv", "final"):
            base = name
        else:
            raise KeyError(f"unexpected flax component {name!r}")
        # EqualizedConv2d/Linear park the weight inside an EqualizedWeight
        # submodule ('....weight.weight'); bias is direct
        return base + (".weight.weight" if leaf == "weight" else ".bias")

    def walk(tree, prefix=()):
        new = {}
        for k, v in tree.items():
            if hasattr(v, "items"):
                new[k] = walk(v, prefix + (k,))
                continue
            key = torch_key(prefix, k)
            if key not in tensors:
                raise KeyError(f"missing torch key {key} for "
                               f"{'/'.join(prefix)}/{k}")
            t = tensors[key]
            consumed.add(key)
            arr = np.asarray(v)
            if t.ndim == 4:  # conv (out, in, kh, kw) -> (kh, kw, in, out)
                out = np.transpose(t, (2, 3, 1, 0))
            elif t.ndim == 2 and prefix[0] == "final":
                h, w = head_hw
                o, fin = t.shape
                c = fin // (h * w)
                # channel-major torch flatten -> spatial-major flax flatten
                out = (t.reshape(o, c, h, w).transpose(2, 3, 1, 0)
                       .reshape(h * w * c, o))
            elif t.ndim == 2:
                out = t.T
            else:
                out = t
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
