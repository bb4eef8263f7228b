"""Model registry — the config-driven replacement for the reference's
factory modules (/root/reference/units/get_generators.py:12-111,
/root/reference/units/get_discriminator.py:15-91) *and* for the newer
variants that had no factory upstream (G13_1..13_5, G14, D9_2..9_4,
D9_small — SURVEY.md SS1 "no factory" quirk; here every model is named).

Names mirror the reference file stems. Each entry is a zero-boilerplate
constructor taking reference-default kwargs.
"""

from typing import Callable, Dict

from gan_tpu.models.generators import (
    Generator1,
    Generator2,
    Generator3ProGAN,
    Generator4,
    Generator5,
    Generator6,
    Generator7,
    Generator8,
    Generator9,
    Generator10,
    Generator10_2,
    Generator11,
    Generator12,
    Generator13,
    Generator13_5,
    Generator13_1,
    Generator13_3,
    Generator13_4,
    Generator14,
)
from gan_tpu.models.discriminators import (
    Discriminator1,
    Discriminator2,
    Discriminator3WGANGP,
    Discriminator3WGANGPSN,
    Discriminator3ProGAN,
    Discriminator4,
    Discriminator5,
    Discriminator5WGANGP,
    Discriminator5WGANGPSN,
    Discriminator6WGANGP,
    Discriminator7WGANGP,
    Discriminator7WGANGPSN,
    Discriminator8,
    Discriminator9,
    Discriminator9_2,
    Discriminator9_3,
    Discriminator9_4,
    Discriminator9Small,
)

GENERATORS: Dict[str, Callable] = {
    # reference factory defaults: get_1(z, (3,64,64)); get_2(nz, ngf, nc);
    # get_4..get_13 default z_dim=128 (main.py passes nz=256 explicitly).
    "G1": lambda z_dim=256, **kw: Generator1(z_dim=z_dim, **kw),
    "G2": lambda z_dim=256, ngf=256, nc=3, **kw: Generator2(
        z_dim=z_dim, ngf=ngf, nc=nc, **kw
    ),
    "G3_progan": lambda z_dim=256, ngf=256, nc=3, **kw: Generator3ProGAN(
        z_dim=z_dim, ngf=ngf, nc=nc, **kw
    ),
    "G4": lambda z_dim=256, **kw: Generator4(z_dim=z_dim, **kw),
    "G5": lambda z_dim=256, **kw: Generator5(z_dim=z_dim, **kw),
    "G6": lambda z_dim=256, **kw: Generator6(z_dim=z_dim, **kw),
    "G7": lambda z_dim=256, **kw: Generator7(z_dim=z_dim, **kw),
    "G8": lambda z_dim=256, **kw: Generator8(z_dim=z_dim, **kw),
    "G9": lambda z_dim=256, **kw: Generator9(z_dim=z_dim, **kw),
    "G10": lambda z_dim=256, **kw: Generator10(z_dim=z_dim, **kw),
    "G10_2": lambda z_dim=256, **kw: Generator10_2(z_dim=z_dim, **kw),
    "G11": lambda z_dim=256, **kw: Generator11(z_dim=z_dim, **kw),
    "G12": lambda z_dim=256, **kw: Generator12(z_dim=z_dim, **kw),
    "G13": lambda z_dim=256, **kw: Generator13(z_dim=z_dim, **kw),
    # generator_13_2.py is a byte-identical copy of generator_13.py
    "G13_2": lambda z_dim=256, **kw: Generator13(z_dim=z_dim, **kw),
    "G13_5": lambda z_dim=256, **kw: Generator13_5(z_dim=z_dim, **kw),
    "G13_1": lambda z_dim=256, **kw: Generator13_1(z_dim=z_dim, **kw),
    "G13_3": lambda z_dim=256, **kw: Generator13_3(z_dim=z_dim, **kw),
    "G13_4": lambda z_dim=256, **kw: Generator13_4(z_dim=z_dim, **kw),
    "G14": lambda z_dim=256, **kw: Generator14(z_dim=z_dim, **kw),
}

DISCRIMINATORS: Dict[str, Callable] = {
    "D1": lambda **kw: Discriminator1(**kw),
    "D2": lambda ndf=64, nc=3, **kw: Discriminator2(ndf=ndf, nc=nc, **kw),
    "D3_wgangp": lambda ndf=128, nc=3, **kw: Discriminator3WGANGP(
        ndf=ndf, nc=nc, **kw
    ),
    "D3_wgangpsn": lambda ndf=64, nc=3, **kw: Discriminator3WGANGPSN(
        ndf=ndf, nc=nc, **kw
    ),
    "D3_wgangp_progan": lambda ndf=64, nc=3, **kw: Discriminator3ProGAN(
        ndf=ndf, nc=nc, **kw
    ),
    "D4": lambda **kw: Discriminator4(**kw),
    "D5": lambda **kw: Discriminator5(**kw),
    "D5_wgangp": lambda **kw: Discriminator5WGANGP(**kw),
    "D5_wgangpsn": lambda **kw: Discriminator5WGANGPSN(**kw),
    "D6_wgangp": lambda **kw: Discriminator6WGANGP(**kw),
    "D7_wgangp": lambda **kw: Discriminator7WGANGP(**kw),
    "D7_wgangpsn": lambda **kw: Discriminator7WGANGPSN(**kw),
    "D8": lambda log_resolution=6, **kw: Discriminator8(
        log_resolution=log_resolution, **kw
    ),
    "D9": lambda **kw: Discriminator9(**kw),
    "D9_2": lambda **kw: Discriminator9_2(**kw),
    "D9_3": lambda **kw: Discriminator9_3(**kw),
    "D9_4": lambda **kw: Discriminator9_4(**kw),
    "D9_small": lambda **kw: Discriminator9Small(**kw),
}


def build_generator(name: str, **kwargs):
    if name not in GENERATORS:
        raise KeyError(
            f"unknown generator {name!r}; available: {sorted(GENERATORS)}"
        )
    return GENERATORS[name](**kwargs)


def build_discriminator(name: str, **kwargs):
    if name not in DISCRIMINATORS:
        raise KeyError(
            f"unknown discriminator {name!r}; available: {sorted(DISCRIMINATORS)}"
        )
    return DISCRIMINATORS[name](**kwargs)
