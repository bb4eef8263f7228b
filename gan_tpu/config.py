"""Dataclass config tree + named presets.

Replaces the reference's comment-toggling "config system"
(/root/reference/main.py:31-80, SURVEY.md SS5.6) with explicit run configs.
The five presets reproduce BASELINE.json's config list.
"""

import dataclasses
from typing import Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RunConfig:
    name: str
    generator: str
    discriminator: str
    objective: str
    g_kwargs: Dict = dataclasses.field(default_factory=dict)
    d_kwargs: Dict = dataclasses.field(default_factory=dict)
    nz: int = 256
    batch_size: int = 8
    num_epochs: int = 403
    image_size: Tuple[int, int] = (64, 64)
    dataroot: Optional[str] = None  # None -> synthetic data
    seed: int = 0
    workdir: str = "."


# BASELINE.json "configs" list, in order.
PRESETS: Dict[str, RunConfig] = {
    # 1. DCGAN baseline (CPU-runnable smoke)
    "smoke_gan": RunConfig(
        name="smoke_gan",
        generator="G1",
        discriminator="D1",
        objective="gan",
        batch_size=64,
    ),
    # 2. WGAN weight clipping
    "wgan_clip": RunConfig(
        name="wgan_clip",
        generator="G5",
        discriminator="D5_wgangp",
        objective="wgan",
    ),
    # 3. WGAN-GP (double-backprop penalty)
    "wgangp": RunConfig(
        name="wgangp",
        generator="G6",
        discriminator="D6_wgangp",
        objective="wgangp",
    ),
    # 4. WGAN-SN + R2 (+ mixup available in data.augment)
    "wgansn_r2": RunConfig(
        name="wgansn_r2",
        generator="G9",
        discriminator="D9",
        objective="wgansnR2",
    ),
    # 5. Final thesis pair
    "thesis": RunConfig(
        name="thesis",
        generator="G13_5",
        discriminator="D9_4",
        objective="wganlazygpR2",
        num_epochs=47,
    ),
}


def get_preset(name: str) -> RunConfig:
    return PRESETS[name]
