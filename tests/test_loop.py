"""Trainer loop tests: cadence (k-steps-per-dispatch) plumbing + artifacts.

The step-math equivalence of the cadence program is covered by
tests/test_train_step.py::test_cadence_matches_individual_steps; here we
drive the user-facing Trainer (reference Train.train() replacement,
/root/reference/train/wganlazygpR2.py:69-108) end to end with use_cadence
and check the lazy cadence and artifact surface survive the group dispatch.
"""


import numpy as np

from gan_tpu.data import SyntheticDataset, DataLoader
from gan_tpu.models import build_generator, build_discriminator
from gan_tpu.objectives import get_objective
from gan_tpu.train.loop import Trainer



def test_trainer_cadence_mode(tmp_path):
    # 7 batches/epoch: one full 5-step cadence group + a 2-step tail that
    # exercises the single-step fallback
    loader = DataLoader(SyntheticDataset(n=56, size=(64, 64)), batch_size=8)
    tr = Trainer(
        dataloader=loader,
        num_epochs=1,
        nz=32,
        generator=build_generator("G1", z_dim=32),
        generator_name="G1",
        discriminator=build_discriminator("D1"),
        discriminator_name="D1",
        objective=get_objective("wganlazygpR2"),
        workdir=str(tmp_path),
        log_every=0,
        checkpoint=False,
        use_cadence=True,
    )
    assert tr.use_cadence
    tr.train()

    assert int(tr.state.step) == 7
    # reference cadence: records every 30 iters -> only i=0 recorded here;
    # penalty columns nonzero there (wganlazygpR2.py:56-75)
    txt = (tmp_path / "wganlazygpR2.txt").read_text().strip().splitlines()
    assert len(txt) == 1
    assert "Gradient penalties" in txt[0]
    gp = float(txt[0].split("Gradient penalties ")[1].split()[0])
    assert np.isfinite(gp) and gp != 0.0
    assert (tmp_path / "generated_images" / "0-0.png").exists()
    assert (tmp_path / "wganlazygpR2.png").exists()
