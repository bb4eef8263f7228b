"""Parity checker: instantiate a reference PyTorch model (read-only import
from /root/reference) and the gan_tpu rebuild, compare parameter counts.

Usage: python tools/param_parity.py G4 [--ref-only]
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def load_ref_module(relpath: str, name: str):
    # the reference does bare `from generators import ...` style imports;
    # make its root importable
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # some reference files import torchsummary at module top; stub it
    if "torchsummary" not in sys.modules:
        import types

        stub = types.ModuleType("torchsummary")
        stub.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = stub
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def torch_count(model) -> int:
    # trainable params only: the reference stores the fixed Smooth blur
    # kernel as an nn.Parameter(requires_grad=False) (generator_12.py:27);
    # our rebuild keeps it as a constant, not a parameter.
    return sum(p.numel() for p in model.parameters() if p.requires_grad)


# name -> (reference relpath, reference ctor, ctor kwargs, ours builder)
def build_cases():
    import torch  # noqa

    def ref(rel, **kw):
        mod = load_ref_module(rel, rel.replace("/", "_").replace(".py", ""))
        return mod.Generator(**kw) if "generators/" in rel else mod.Discriminator(**kw)

    return {
        "G1": lambda: ref("generators/generator_1.py", z_dim=256,
                          target_image_size=(3, 64, 64)),
        "G2": lambda: ref("generators/generator_2.py", ngpu=1, nz=256, ngf=256, nc=3),
        "G3_progan": lambda: ref("generators/generator_3_progan.py", ngpu=1,
                                 nz=256, ngf=256, nc=3),
        "G4": lambda: ref("generators/generator_4.py", z_dim=256),
        "G5": lambda: ref("generators/generator_5.py", z_dim=256),
        "G6": lambda: ref("generators/generator_6.py", z_dim=256),
        "G7": lambda: ref("generators/generator_7.py", z_dim=256),
        "G8": lambda: ref("generators/generator_8.py", z_dim=256),
        "G9": lambda: ref("generators/generator_9.py", z_dim=256),
        "G10": lambda: ref("generators/generator_10.py", z_dim=256),
        "G10_2": lambda: ref("generators/generator_10_2.py", z_dim=256),
        "G11": lambda: ref("generators/generator_11.py", z_dim=256),
        "G12": lambda: ref("generators/generator_12.py", z_dim=256),
        "G13": lambda: ref("generators/generator_13.py", z_dim=256),
        "G13_1": lambda: ref("generators/generator_13_1.py", z_dim=256),
        "G13_3": lambda: ref("generators/generator_13_3.py", z_dim=256),
        "G13_4": lambda: ref("generators/generator_13_4.py", z_dim=256),
        "G13_5": lambda: ref("generators/generator_13_5.py", z_dim=256),
        "G14": lambda: ref("generators/generator_14.py", z_dim=256),
        "D1": lambda: ref("discriminators/discriminator_1.py", image_size=(3, 64, 64)),
        "D2": lambda: ref("discriminators/discriminator_2.py", ngpu=1, ndf=64, nc=3),
        "D3_wgangp": lambda: ref("discriminators/discriminator_3_wgangp.py",
                                 ngpu=1, ndf=128, nc=3),
        "D3_wgangpsn": lambda: ref("discriminators/discriminator_3_wgangpsn.py",
                                   ngpu=1, ndf=64, nc=3),
        "D3_wgangp_progan": lambda: ref(
            "discriminators/discriminator_3_wgangp_progan.py", ngpu=1, ndf=64, nc=3),
        "D4": lambda: ref("discriminators/discriminator_4.py"),
        "D5": lambda: ref("discriminators/discriminator_5.py"),
        "D5_wgangp": lambda: ref("discriminators/discriminator_5_wgangp.py"),
        "D5_wgangpsn": lambda: ref("discriminators/discriminator_5_wgangpsn.py"),
        "D6_wgangp": lambda: ref("discriminators/discriminator_6_wgangp.py"),
        "D7_wgangp": lambda: ref("discriminators/discriminator_7_wgangp.py"),
        "D7_wgangpsn": lambda: ref("discriminators/discriminator_7_wgangpsn.py"),
        "D8": lambda: ref("discriminators/discriminator_8.py", log_resolution=6),
        "D9": lambda: ref("discriminators/discriminator_9.py"),
        "D9_2": lambda: ref("discriminators/discriminator_9_2.py"),
        "D9_3": lambda: ref("discriminators/discriminator_9_3.py"),
        "D9_4": lambda: ref("discriminators/discriminator_9_4.py"),
        "D9_small": lambda: ref("discriminators/discriminator_9_small.py"),
    }


def ours_count(name: str) -> int:
    import jax
    import jax.numpy as jnp
    from gan_tpu.models import build_generator, build_discriminator
    from gan_tpu.utils import param_count

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    # eval_shape: no compilation, no device — just trace for shapes
    if name.startswith("G"):
        m = build_generator(name, z_dim=256)
        v = jax.eval_shape(
            lambda: m.init(rngs, jnp.zeros((4, 256)), train=True)
        )
    else:
        m = build_discriminator(name)
        v = jax.eval_shape(
            lambda: m.init(rngs, jnp.zeros((4, 64, 64, 3)), train=True,
                           update_sn=False)
        )
    return param_count(dict(v)["params"])


if __name__ == "__main__":
    names = sys.argv[1:] or ["G1"]
    ref_only = "--ref-only" in names
    names = [n for n in names if not n.startswith("--")]
    cases = build_cases()
    for name in names:
        r = torch_count(cases[name]())
        if ref_only:
            print(f"{name}: ref={r}")
            continue
        o = ours_count(name)
        status = "OK" if r == o else f"MISMATCH (diff {o - r:+d})"
        print(f"{name}: ref={r} ours={o} {status}")
