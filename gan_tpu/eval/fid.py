"""FID harness (BASELINE.json metric: "FID@24ep on cats-faces-64x64").

The Frechet distance math is exact. The feature extractor is pluggable:

- InceptionV3 pool3 features are the standard. This environment has no
  network egress and no cached weights, so `inception_extractor(npz_path)`
  loads them from a user-provided .npz (documented format below).
- `RandomConvFeatures` is the default offline proxy: a fixed-seed random
  conv net. Random-feature Frechet distances preserve relative ordering
  well for same-domain comparisons (cf. Naeem et al. 2020 on random-feature
  evaluation); absolute values are NOT comparable to Inception-FID and are
  labeled `fid_proxy` in reports.
"""

from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """||mu1-mu2||^2 + Tr(cov1 + cov2 - 2 (cov1 cov2)^(1/2)).

    The matrix square root is computed via eigendecomposition of the
    symmetrized product (numerically robust for PSD inputs).
    """
    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64) + eps * np.eye(len(mu1))
    cov2 = np.asarray(cov2, np.float64) + eps * np.eye(len(mu2))
    diff = mu1 - mu2

    # sqrtm(cov1) via symmetric eigendecomposition
    w1, v1 = np.linalg.eigh(cov1)
    sqrt1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    inner = sqrt1 @ cov2 @ sqrt1
    w, _ = np.linalg.eigh((inner + inner.T) / 2)
    tr_sqrt = np.sum(np.sqrt(np.clip(w, 0, None)))

    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * tr_sqrt)


class RandomConvFeatures:
    """Fixed-seed random CNN feature extractor (offline FID proxy).

    64x64x3 -> 4 stride-2 conv stages (LeakyReLU) -> global mean/max pool
    concat -> `dim` features. Deterministic across processes (seed-keyed
    orthogonal-ish init from jax PRNG)."""

    name = "random_conv"

    def __init__(self, dim: int = 512, seed: int = 0):
        self.dim = dim
        widths = [32, 64, 128, dim // 2]
        keys = jax.random.split(jax.random.PRNGKey(seed), len(widths))
        self.kernels = []
        in_ch = 3
        for k, w in zip(keys, widths):
            fan_in = 3 * 3 * in_ch
            self.kernels.append(
                jax.random.normal(k, (3, 3, in_ch, w)) / np.sqrt(fan_in)
            )
            in_ch = w

        def feats(x):
            # x: (B, 64, 64, 3) in [0, 1]
            x = x * 2.0 - 1.0
            for kern in self.kernels:
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, kern.shape, ("NHWC", "HWIO", "NHWC")
                )
                x = jax.lax.conv_general_dilated(
                    x, kern, (2, 2), "SAME", dimension_numbers=dn
                )
                x = jax.nn.leaky_relu(x, 0.2)
            return jnp.concatenate(
                [jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))], axis=-1
            )

        self._feats = jax.jit(feats)

    def __call__(self, images01: jax.Array) -> np.ndarray:
        return np.asarray(self._feats(images01))


def feature_stats(
    batches: Iterable[np.ndarray], extractor: Callable
) -> tuple:
    """Streaming mean/cov over image batches (each NHWC in [0,1])."""
    n = 0
    s = None
    ss = None
    for b in batches:
        f = np.asarray(extractor(jnp.asarray(b, jnp.float32)), np.float64)
        if s is None:
            s = np.zeros(f.shape[1])
            ss = np.zeros((f.shape[1], f.shape[1]))
        n += f.shape[0]
        s += f.sum(0)
        ss += f.T @ f
    mu = s / n
    cov = (ss - n * np.outer(mu, mu)) / max(n - 1, 1)
    return mu, cov


def compute_fid(
    real_batches: Iterable[np.ndarray],
    fake_batches: Iterable[np.ndarray],
    extractor: Optional[Callable] = None,
) -> dict:
    """FID between two image streams (NHWC float in [0,1]).

    Returns {"value", "metric"} — metric is "fid" for inception features
    and "fid_proxy:<name>" otherwise."""
    if extractor is None:
        extractor = RandomConvFeatures()
    mu1, cov1 = feature_stats(real_batches, extractor)
    mu2, cov2 = feature_stats(fake_batches, extractor)
    value = frechet_distance(mu1, cov1, mu2, cov2)
    name = getattr(extractor, "name", "custom")
    metric = "fid" if name == "inception_v3" else f"fid_proxy:{name}"
    return {"value": value, "metric": metric}


class NpzConvFeatures:
    """Feature extractor with weights loaded from a user-provided .npz —
    the no-egress path to REAL feature-space FID (SURVEY SS6: this
    machine cannot download Inception weights).

    npz format (documented contract, tested with a checked-in-style
    fixture in tests/test_fid.py):
      conv_0 .. conv_{n-1} : (kh, kw, in, out) float kernels, applied in
                             index order as stride-2 SAME convs with
                             LeakyReLU(0.2) between (set `strides` to
                             override, one int per conv);
      strides (optional)   : (n,) int array of per-conv strides;
      name (optional)      : 0-d string; "inception_v3" marks the
                             features as real Inception pool3 features so
                             compute_fid reports metric "fid" instead of
                             "fid_proxy:...".
    Features = concat(global mean pool, global max pool) of the last map.
    """

    def __init__(self, npz_path: str):
        blob = np.load(npz_path, allow_pickle=False)
        ks = sorted(
            (k for k in blob.files if k.startswith("conv_")),
            key=lambda s: int(s.split("_")[1]),
        )
        if not ks:
            raise ValueError(f"{npz_path}: no conv_<i> kernels")
        self.kernels = [jnp.asarray(blob[k], jnp.float32) for k in ks]
        if "strides" in blob.files:
            self.strides = [int(s) for s in blob["strides"]]
        else:
            self.strides = [2] * len(self.kernels)
        self.name = (
            str(blob["name"]) if "name" in blob.files else "npz_conv"
        )

        def feats(x):
            x = x * 2.0 - 1.0
            for kern, s in zip(self.kernels, self.strides):
                dn = jax.lax.conv_dimension_numbers(
                    x.shape, kern.shape, ("NHWC", "HWIO", "NHWC")
                )
                x = jax.lax.conv_general_dilated(
                    x, kern, (s, s), "SAME", dimension_numbers=dn
                )
                x = jax.nn.leaky_relu(x, 0.2)
            return jnp.concatenate(
                [jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))], axis=-1
            )

        self._feats = jax.jit(feats)

    def __call__(self, images01: jax.Array) -> np.ndarray:
        return np.asarray(self._feats(images01))


def inception_extractor(npz_path: str) -> NpzConvFeatures:
    """Load a feature extractor from .npz (format: NpzConvFeatures
    docstring). Name it "inception_v3" inside the npz when the kernels are
    converted real Inception weights; compute_fid then reports "fid"."""
    return NpzConvFeatures(npz_path)


def save_stats_npz(path: str, mu, cov, extractor_name: str = "custom",
                   n: int = 0) -> None:
    """Write feature statistics in the standard pytorch-fid layout
    (keys mu/sigma) + provenance (extractor name, sample count)."""
    np.savez(path, mu=np.asarray(mu, np.float64),
             sigma=np.asarray(cov, np.float64),
             extractor=np.asarray(extractor_name), n=np.asarray(n))


def load_stats_npz(path: str) -> tuple:
    """Load (mu, cov[, extractor_name]) from a stats .npz. Accepts the
    pytorch-fid/cleanfid convention (keys ``mu``/``sigma``) or
    ``mu``/``cov`` — so a cats-faces stats file produced elsewhere with
    pytorch-fid drops in directly (docs/FID.md)."""
    blob = np.load(path, allow_pickle=False)
    mu = np.asarray(blob["mu"], np.float64)
    key = "sigma" if "sigma" in blob.files else "cov"
    cov = np.asarray(blob[key], np.float64)
    name = str(blob["extractor"]) if "extractor" in blob.files else "unknown"
    return mu, cov, name


def fid_from_npz(
    stats_npz: str,
    fake_batches: Iterable[np.ndarray],
    extractor: Optional[Callable] = None,
) -> dict:
    """FID of an image stream against PRECOMPUTED real-set statistics.

    The real side comes from a stats .npz (load_stats_npz formats); the
    fake side is featurized with `extractor`, which MUST be the same
    feature space the stats were computed in (pass
    inception_extractor(...) for a converted real-Inception stats file;
    the default RandomConvFeatures only matches stats produced by
    tools/export_fid_stats.py with the same seed/dim). Reports metric
    "fid" only when both sides declare inception_v3."""
    if extractor is None:
        extractor = RandomConvFeatures()
    mu_r, cov_r, stats_name = load_stats_npz(stats_npz)
    mu_f, cov_f = feature_stats(fake_batches, extractor)
    if mu_f.shape != mu_r.shape:
        raise ValueError(
            f"feature dim mismatch: stats {mu_r.shape} vs extractor "
            f"{mu_f.shape} — stats and extractor must share a feature space")
    value = frechet_distance(mu_r, cov_r, mu_f, cov_f)
    ex_name = getattr(extractor, "name", "custom")
    metric = ("fid" if ex_name == "inception_v3"
              and stats_name in ("inception_v3", "unknown")
              else f"fid_proxy:{ex_name}")
    return {"value": value, "metric": metric, "stats_extractor": stats_name}
