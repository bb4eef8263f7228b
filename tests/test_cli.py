"""CLI smoke tests (argument plumbing; no training)."""

import dataclasses

from gan_tpu.run import parse_args
from gan_tpu.config import PRESETS, get_preset


def test_parse_defaults():
    a = parse_args([])
    assert a.preset is None and a.dataroot is None


def test_parse_preset_and_overrides():
    a = parse_args(["--preset", "thesis", "--epochs", "3",
                    "--batch-size", "4", "--workdir", "/tmp/x"])
    cfg = get_preset(a.preset)
    cfg = dataclasses.replace(cfg, num_epochs=a.epochs, batch_size=a.batch_size)
    assert cfg.generator == "G13_5" and cfg.discriminator == "D9_4"
    assert cfg.num_epochs == 3 and cfg.batch_size == 4


def test_presets_reference_baseline_configs():
    # BASELINE.json's five configs, in order
    assert PRESETS["smoke_gan"].objective == "gan"
    assert PRESETS["wgan_clip"].objective == "wgan"
    assert PRESETS["wgangp"].objective == "wgangp"
    assert PRESETS["wgansn_r2"].objective == "wgansnR2"
    assert PRESETS["thesis"].objective == "wganlazygpR2"
    assert PRESETS["thesis"].num_epochs == 47
    # every preset's models exist in the registry
    from gan_tpu.models import GENERATORS, DISCRIMINATORS

    for cfg in PRESETS.values():
        assert cfg.generator in GENERATORS
        assert cfg.discriminator in DISCRIMINATORS