"""Unit tests for bench.py's measured-marker validation and the init-blob
cache key's default-field stability (both bitten live in round 3)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_measured_marker_subset_semantics(tmp_path, monkeypatch):
    """A NEW big executable landing in the cache must not invalidate the
    marker; losing/replacing a measured executable must."""
    import bench

    monkeypatch.setenv("GAN_TPU_COMPILE_CACHE", str(tmp_path))
    big = 60_000_000
    (tmp_path / "jit_a").write_bytes(b"\0" * 1)
    os.truncate(tmp_path / "jit_a", big)
    (tmp_path / "jit_b").write_bytes(b"\0" * 1)
    os.truncate(tmp_path / "jit_b", big + 1)

    rec = {"entries": bench._cache_entries(),
           "fingerprint": bench._cache_fingerprint(),
           "result": {"metric": "m", "value": 1.0, "unit": "u",
                      "vs_baseline": 2.0}}
    with open(bench._measured_marker_path(), "w") as f:
        json.dump(rec, f)

    assert bench._load_measured_marker() is not None

    # new unrelated big program: still valid (the live-bitten case —
    # entry()'s forward landed after the prewarm measurement)
    (tmp_path / "jit_c").write_bytes(b"\0")
    os.truncate(tmp_path / "jit_c", big + 2)
    assert bench._load_measured_marker() is not None

    # a measured executable replaced (size change): invalid
    os.truncate(tmp_path / "jit_a", big + 7)
    assert bench._load_measured_marker() is None


def test_module_signature_skips_default_fields():
    """Adding a config field with a default must not change the signature
    (the live-bitten case: Generator13_5.style_bank orphaned the 2 GB
    flagship init blob under the old full-pickle scheme)."""
    import dataclasses

    from gan_tpu.train.state import _module_signature

    @dataclasses.dataclass(frozen=True)
    class A:
        x: int = 1
        y: str = "a"

    @dataclasses.dataclass(frozen=True)
    class A2:  # A plus a new default-valued field
        x: int = 1
        y: str = "a"
        z: bool = False

    A2.__qualname__ = A.__qualname__
    A2.__module__ = A.__module__
    assert _module_signature(A()) == _module_signature(A2())
    # non-default values still distinguish
    assert _module_signature(A2()) != _module_signature(A2(z=True))
    assert _module_signature(A(x=2)) != _module_signature(A())


def test_abstract_state_matches_create_state():
    """bench.py's AOT overlap lowers the step against abstract_state; a
    structure mismatch with the real create_state output would make the
    AOT executable unusable (and worse, compile a DIFFERENT program than
    the warm cache holds). Pin exact pytree structure + avals."""
    import jax

    from gan_tpu.models import build_generator, build_discriminator
    from gan_tpu.objectives import get_objective
    from gan_tpu.train import create_state
    from gan_tpu.train.state import abstract_state

    obj = get_objective("wganlazygpR2")
    g = build_generator("G1", z_dim=16)
    d = build_discriminator("D3_wgangp", ndf=4)
    g_tx, d_tx = obj.make_optimizers()
    st = create_state(jax.random.PRNGKey(0), g, d, g_tx, d_tx,
                      batch_size=4, image_size=(64, 64, 3))
    ab = abstract_state(g, d, g_tx, d_tx, batch_size=4,
                        image_size=(64, 64, 3))
    assert (jax.tree_util.tree_structure(st)
            == jax.tree_util.tree_structure(ab))
    for a, b in zip(jax.tree_util.tree_leaves(st),
                    jax.tree_util.tree_leaves(ab)):
        assert a.shape == b.shape and a.dtype == b.dtype
