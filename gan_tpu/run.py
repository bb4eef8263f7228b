"""CLI entry point — the config-driven replacement for the reference's
comment-toggled main.py (/root/reference/main.py:18-82).

Usage:
    python -m gan_tpu.run --preset smoke_gan --dataroot ./images/cats
    python -m gan_tpu.run --generator G13_5 --discriminator D9_4 \
        --objective wganlazygpR2 --epochs 47 --batch-size 8

With no --dataroot, trains on deterministic synthetic data (benchmark mode).
"""

import argparse
import dataclasses
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=None, default=None,
                   help="named RunConfig preset (see gan_tpu.config.PRESETS)")
    p.add_argument("--generator", default=None)
    p.add_argument("--discriminator", default=None)
    p.add_argument("--objective", default=None)
    p.add_argument("--dataroot", default=None)
    p.add_argument("--dataset", choices=["auto", "folder", "mnist"],
                   default="auto",
                   help="dataset kind: folder=ImageFolder; mnist=local IDX "
                        "files (reference get_MNIST parity: 0.5-normalize, "
                        "no flip, 1 channel); auto=folder if dataroot else "
                        "synthetic")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--nz", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--workdir", default=None)
    p.add_argument("--synthetic-n", type=int, default=2048,
                   help="synthetic dataset size when no dataroot")
    p.add_argument("--no-checkpoint", action="store_true")
    p.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                   help="model compute dtype (params/optimizer stay f32)")
    p.add_argument("--attn-impl", choices=["einsum", "pallas"], default=None,
                   help="spatial-attention core impl (gan_tpu.ops.attention);"
                        " pallas = fused flash kernel, generator side only"
                        " (discriminators pin einsum for grad-of-grad)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from gan_tpu.config import PRESETS, RunConfig, get_preset

    if args.preset:
        cfg = get_preset(args.preset)
    else:
        cfg = RunConfig(name="custom", generator="G2",
                        discriminator="D3_wgangp", objective="wgangp")
    overrides = {}
    for field, arg in [
        ("generator", args.generator), ("discriminator", args.discriminator),
        ("objective", args.objective), ("dataroot", args.dataroot),
        ("num_epochs", args.epochs), ("batch_size", args.batch_size),
        ("nz", args.nz), ("seed", args.seed), ("workdir", args.workdir),
    ]:
        if arg is not None:
            overrides[field] = arg
    cfg = dataclasses.replace(cfg, **overrides)

    if args.attn_impl:
        import os

        os.environ["GAN_TPU_ATTN_IMPL"] = args.attn_impl

    from gan_tpu.data import DataLoader, ImageFolderDataset, SyntheticDataset
    from gan_tpu.data.datasets import MNISTDataset
    from gan_tpu.models import build_generator, build_discriminator
    from gan_tpu.objectives import get_objective
    from gan_tpu.train.loop import Trainer

    if args.dataset == "mnist":
        if not cfg.dataroot:
            sys.exit("--dataset mnist requires --dataroot (local IDX files)")
        ds = MNISTDataset(cfg.dataroot)
    elif cfg.dataroot:
        ds = ImageFolderDataset(cfg.dataroot, load_size=cfg.image_size)
    else:
        ds = SyntheticDataset(n=args.synthetic_n, size=cfg.image_size,
                              seed=cfg.seed)
    loader = DataLoader(ds, batch_size=cfg.batch_size, seed=cfg.seed)

    dtype = None
    if args.dtype == "bf16":
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    g_kwargs, d_kwargs = dict(cfg.g_kwargs), dict(cfg.d_kwargs)
    if getattr(ds, "channels", 3) != 3:
        # single-channel corpus: models taking an nc arg (G1/G2/G3, D1-D3)
        # get it from the dataset unless the config pinned one. Inspect the
        # builder's signature rather than catching TypeError — a genuine
        # TypeError inside model construction must not be swallowed into a
        # silent 3-channel build (ADVICE r2).
        import inspect

        from gan_tpu.models import GENERATORS, DISCRIMINATORS

        def accepts_nc(builder) -> bool:
            # builders supporting nc name it explicitly (registry.py);
            # **kw passthrough does NOT imply the model class takes nc
            return "nc" in inspect.signature(builder).parameters

        if accepts_nc(GENERATORS[cfg.generator]):
            g_kwargs.setdefault("nc", ds.channels)
        if accepts_nc(DISCRIMINATORS[cfg.discriminator]):
            d_kwargs.setdefault("nc", ds.channels)
    g = build_generator(cfg.generator, z_dim=cfg.nz, dtype=dtype, **g_kwargs)
    d = build_discriminator(cfg.discriminator, dtype=dtype, **d_kwargs)
    trainer = Trainer(
        dataloader=loader,
        num_epochs=cfg.num_epochs,
        nz=cfg.nz,
        generator=g,
        generator_name=cfg.generator,
        discriminator=d,
        discriminator_name=cfg.discriminator,
        objective=get_objective(cfg.objective),
        seed=cfg.seed,
        workdir=cfg.workdir,
        image_size=cfg.image_size,
        checkpoint=not args.no_checkpoint,
    )
    trainer.train()


if __name__ == "__main__":
    main()
