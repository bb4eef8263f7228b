"""The ten reference training loops as one composable objective family.

Each preset maps a file in /root/reference/train/ onto the axes
{base loss} x {R1, R2, GP, lazy cadence, weight clip} x {optimizer override}:

| preset        | reference file      | loss | R1(real) | R2(fake) | GP  | lazy | clip | optimizer        |
|---------------|---------------------|------|----------|----------|-----|------|------|------------------|
| gan           | gan.py              | bce  | -        | -        | -   | -    | -    | TTUR Adam        |
| ganR2         | ganR2.py            | bce  | 1.0      | 1.0      | -   | -    | -    | TTUR Adam        |
| wgan          | wgan.py             | wass | -        | -       | -   | -    | 1.0  | AdamW(0.5,0.999) |
| wgangp        | wgangp.py           | wass | -        | -       | 10  | -    | -    | AdamW(0.5,0.999) |
| wgangpR2      | wgangpR2.py         | wass | 1.0      | 1.0     | 10  | -    | -    | TTUR Adam        |
| wgansn        | wgansn.py           | wass | -        | -       | -   | -    | -    | TTUR Adam        |
| wgansnR2      | wgansnR2.py         | wass | 1.0      | -       | -   | -    | -    | TTUR Adam        |
| wgangpsnR2    | wgangpsnR2.py       | wass | 1.0      | -       | 10  | -    | -    | TTUR Adam        |
| wganlazygp    | wganlazygp.py       | wass | -        | -       | 10  | 5    | -    | TTUR Adam        |
| wganlazygpR2  | wganlazygpR2.py     | wass | 1.0      | 1.0     | 10  | 5    | -    | TTUR Adam        |

Lazy cadence: penalties applied when step %% k == 0, scaled by k to keep the
expectation (wganlazygpR2.py:57-75). "R1" here = the reference's r2_reg_r
(input-gradient penalty at real images), "R2" = r2_reg_f (at fakes).

TTUR Adam: G Adam(1e-4, (0.5, 0.99)); D Adam(4e-4, (0.0, 0.99))
(/root/reference/train/trainunits.py:18-19). AdamW override: both
AdamW(lr as above, betas (0.5, 0.999), torch default weight_decay 0.01)
(/root/reference/train/wgan.py:17-18).

Artifact cadences (fixed-noise grid size, image/record intervals) follow the
per-trainer values in the reference.
"""

import dataclasses
from typing import Optional

import optax


@dataclasses.dataclass(frozen=True)
class Objective:
    name: str
    loss: str = "wasserstein"  # 'bce' | 'wasserstein'
    r1: float = 0.0            # input-grad penalty weight at reals
    r2: float = 0.0            # input-grad penalty weight at fakes
    gp: float = 0.0            # WGAN-GP lambda
    gp_center: float = 1.0
    lazy_interval: int = 1     # penalties every k steps, scaled by k
    weight_clip: Optional[float] = None
    # mixup (units/mixup.py is dead code upstream — SURVEY C9 — but a named
    # rebuild target). alpha > 0 adds a mixed real/fake term to the D loss
    # with per-sample Beta soft labels (mixup_data_wgan, mixup.py:19-27):
    # BCE objectives score D(mixed) against the soft label; Wasserstein
    # objectives use the signed soft weight (2*label-1) on -D(mixed).
    mixup_alpha: float = 0.0
    optimizer: str = "ttur_adam"  # 'ttur_adam' | 'adamw'
    spectral_norm: bool = False   # informational: expects an SN discriminator
    # artifact cadences (reference per-trainer values)
    fixed_noise: int = 64
    image_every: int = 10
    record_every: Optional[int] = None
    ckpt_every_epoch: bool = True

    @property
    def needs_penalty_branch(self) -> bool:
        return (self.r1 > 0) or (self.r2 > 0) or (self.gp > 0)

    def make_optimizers(self, g_lr=1e-4, d_lr=4e-4, flat=None):
        """Returns (g_tx, d_tx) matching the reference optimizer setup.

        flat=True wraps both in the flat-vector adapter
        (gan_tpu.train.flat_opt) — mathematically identical for these
        elementwise optimizers, but one fused update instead of
        thousands of per-leaf ops. Default: env GAN_TPU_FLAT_OPT (on).
        CAUTION: at >100M params XLA gives the unravel split a padded
        (N/3, 3)-tiled layout that OOMs HBM at compile time — disable for
        the largest models (bench does this for the flagship).
        """
        if flat is None:
            import os

            flat = os.environ.get("GAN_TPU_FLAT_OPT", "1") == "1"
        if self.optimizer == "adamw":
            g_tx = optax.adamw(g_lr, b1=0.5, b2=0.999, eps=1e-8, weight_decay=0.01)
            d_tx = optax.adamw(d_lr, b1=0.5, b2=0.999, eps=1e-8, weight_decay=0.01)
        else:
            g_tx = optax.adam(g_lr, b1=0.5, b2=0.99, eps=1e-8)
            d_tx = optax.adam(d_lr, b1=0.0, b2=0.99, eps=1e-8)
        if flat:
            from gan_tpu.train.flat_opt import flatten_optimizer

            g_tx = flatten_optimizer(g_tx)
            d_tx = flatten_optimizer(d_tx)
        return g_tx, d_tx


OBJECTIVES = {
    "gan": Objective(name="gan", loss="bce", image_every=0),
    "ganR2": Objective(name="ganR2", loss="bce", r1=1.0, r2=1.0, image_every=0,
                       ckpt_every_epoch=False),
    "wgan": Objective(name="wgan", weight_clip=1.0, optimizer="adamw",
                      ckpt_every_epoch=False),
    "wgangp": Objective(name="wgangp", gp=10.0, optimizer="adamw"),
    "wgangpR2": Objective(name="wgangpR2", r1=1.0, r2=1.0, gp=10.0,
                          image_every=20),
    "wgansn": Objective(name="wgansn", spectral_norm=True),
    "wgansnR2": Objective(name="wgansnR2", r1=1.0, spectral_norm=True),
    "wgangpsnR2": Objective(name="wgangpsnR2", r1=1.0, gp=10.0,
                            spectral_norm=True),
    "wganlazygp": Objective(name="wganlazygp", gp=10.0, lazy_interval=5,
                            fixed_noise=16, image_every=30, record_every=30,
                            ckpt_every_epoch=False),
    "wganlazygpR2": Objective(name="wganlazygpR2", r1=1.0, r2=1.0, gp=10.0,
                              lazy_interval=5, fixed_noise=16, image_every=30,
                              record_every=30, ckpt_every_epoch=False),
}


def get_objective(name: str) -> Objective:
    return OBJECTIVES[name]
