"""The single step-state pytree.

Replaces the reference's scattered mutable state — module objects, optimizer
objects, SN parametrization buffers, BN running stats, and the epoch/iter
counters carried on the Units trainer (/root/reference/train/trainunits.py:
12-26) — with one explicit, checkpointable pytree (SURVEY.md SS7 hard part 5).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GANTrainState:
    step: jax.Array            # global step counter (int32)
    g_params: Any
    g_state: Any               # G mutable collections (batch_stats, ...)
    d_params: Any
    d_state: Any               # D mutable collections (batch_stats, spectral)
    g_opt: Any
    d_opt: Any


def _split_vars(variables):
    variables = dict(variables)
    params = variables.pop("params")
    return params, variables


def create_state(
    rng: jax.Array,
    g_model,
    d_model,
    g_tx,
    d_tx,
    batch_size: int = 8,
    image_size=(64, 64, 3),
    init_on_cpu: bool = True,
) -> GANTrainState:
    """Initialize both networks and optimizers into one state pytree.

    init_on_cpu: when the default backend is an accelerator, run the model
    init in a fresh JAX_PLATFORMS=cpu subprocess (plain CPU plugin) and
    transfer once. Under the axon TPU platform both eager dispatch and XLA
    compiles route through a slow per-op AOT relay — a deep zoo model's
    init takes 20-60 minutes in-process either way, vs seconds of plain
    CPU eager in a clean process (SURVEY.md SS7 hard part 4).
    """
    if init_on_cpu and jax.default_backend() != "cpu":
        vars_ = _init_in_subprocess(g_model, d_model, rng, batch_size, image_size)
        if vars_ is not None:
            g_params, g_state = _split_vars(vars_["g"])
            d_params, d_state = _split_vars(vars_["d"])
            dev = jax.devices()[0]
            g_params = jax.device_put(g_params, dev)
            d_params = jax.device_put(d_params, dev)
            g_state = jax.device_put(g_state, dev)
            d_state = jax.device_put(d_state, dev)
            opt_init = jax.jit(lambda gp, dp: (g_tx.init(gp), d_tx.init(dp)))
            g_opt, d_opt = opt_init(g_params, d_params)
            return GANTrainState(
                step=jnp.zeros((), jnp.int32),
                g_params=g_params,
                g_state=g_state,
                d_params=d_params,
                d_state=d_state,
                g_opt=g_opt,
                d_opt=d_opt,
            )

    def build(rng_):
        kg, kd, kn = jax.random.split(rng_, 3)
        z = jnp.zeros((batch_size, g_model.z_dim), jnp.float32)
        x = jnp.zeros((batch_size, *image_size), jnp.float32)
        g_vars = g_model.init({"params": kg, "noise": kn}, z, train=True)
        d_vars = d_model.init({"params": kd}, x, train=True, update_sn=False)
        g_params, g_state = _split_vars(g_vars)
        d_params, d_state = _split_vars(d_vars)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_state=g_state,
            d_params=d_params,
            d_state=d_state,
            g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_params),
        )

    return jax.block_until_ready(jax.jit(build)(rng))


def abstract_state(
    g_model,
    d_model,
    g_tx,
    d_tx,
    batch_size: int = 8,
    image_size=(64, 64, 3),
    seed: int = 0,
) -> GANTrainState:
    """ShapeDtypeStruct pytree with the EXACT structure create_state's
    subprocess path produces — built from the init-blob template (no
    device work, no 2 GB deserialize). Lets bench.py AOT-lower/compile the
    step program CONCURRENTLY with the real create_state: the two
    dominant cold-start costs (blob load ~3 min, executable loads ~9 min
    over the relay, BENCH_r03 stage marks) overlap instead of serializing.
    """
    template, _, _, _ = init_cache_info(
        g_model, d_model, seed, batch_size, image_size)

    def build(vars_):
        g_params, g_state = _split_vars(vars_["g"])
        d_params, d_state = _split_vars(vars_["d"])
        return GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_state=g_state,
            d_params=d_params,
            d_state=d_state,
            g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_params),
        )

    return jax.eval_shape(build, template)


def _stable_dumps(obj) -> bytes:
    """pickle.dumps with flax's per-process FlaxId counters zeroed, so the
    bytes are a process-stable structural key for a module tree (used only
    for hashing, never unpickled)."""
    import copyreg
    import io
    import pickle

    from flax.ids import FlaxId

    buf = io.BytesIO()
    p = pickle.Pickler(buf)
    p.dispatch_table = copyreg.dispatch_table.copy()
    p.dispatch_table[FlaxId] = lambda _o: (int, (0,))
    p.dump(obj)
    return buf.getvalue()


def _module_signature(obj) -> bytes:
    """Canonical bytes for a module-config tree: class identity plus the
    NON-DEFAULT dataclass fields only. Used (alongside the structural
    signature) as the init-blob cache key — skipping default-valued fields
    means ADDING a new config field with a default (e.g.
    Generator13_5.style_bank) does not invalidate every existing blob,
    while still catching value-affecting config differences (the ADVICE r2
    medium: distinct init distributions under identical structure).

    Existing blobs keyed under the older full-pickle scheme are adopted by
    tools/rekey_init_blob.py (the hash bytes of that scheme cannot be
    reproduced once a class gains a field)."""
    import dataclasses

    def canon(o):
        if dataclasses.is_dataclass(o) and not isinstance(o, type):
            items = []
            for f in dataclasses.fields(o):
                if f.name in ("parent", "name"):  # flax plumbing
                    continue
                v = getattr(o, f.name, None)
                default = f.default
                if default is dataclasses.MISSING and \
                        f.default_factory is not dataclasses.MISSING:
                    default = f.default_factory()
                try:
                    if default is not dataclasses.MISSING and v == default:
                        continue
                except Exception:
                    pass
                items.append((f.name, canon(v)))
            return (type(o).__module__, type(o).__qualname__, tuple(items))
        if isinstance(o, (list, tuple)):
            return ("seq", tuple(canon(x) for x in o))
        if isinstance(o, dict):
            return ("map", tuple(sorted((str(k), canon(v))
                                        for k, v in o.items())))
        return repr(o)

    return repr(canon(obj)).encode()


def init_cache_info(g_model, d_model, seed, batch_size, image_size):
    """(template, cache_file) for the init-blob cache: the abstract variable
    structure (eval_shape of both inits) and the blob path keyed on
    structure + seed + the normalized module signature. Shared by
    create_state's subprocess path and the offline blob tools
    (tools/rekey_init_blob.py, tools/bank_blob.py)."""
    import hashlib
    import os

    def _f32(m):
        try:
            return m.clone(dtype=None) if getattr(m, "dtype", None) is not None else m
        except Exception:
            return m

    def _norm_impl(m):
        if getattr(m, "rir_impl", None) is not None:
            try:
                return m.clone(rir_impl="vmap")
            except Exception:
                return m
        return m

    def _norm_perf(m):
        if getattr(m, "remat", None) not in (None, True):
            try:
                return m.clone(remat=True)
            except Exception:
                return m
        return m

    g_model = _norm_perf(_norm_impl(_f32(g_model)))
    d_model = _norm_perf(_norm_impl(_f32(d_model)))
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))

    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    template = jax.eval_shape(
        lambda: {
            "g": dict(g_model.init(
                rngs, jnp.zeros((batch_size, g_model.z_dim)), train=True)),
            "d": dict(d_model.init(
                rngs, jnp.zeros((batch_size, *image_size)), train=True,
                update_sn=False)),
        }
    )
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    sig = [(jax.tree_util.keystr(p), tuple(l.shape), str(l.dtype))
           for p, l in flat]
    spec = repr((sig, seed)).encode() + _module_signature((g_model, d_model))
    cache_dir = os.environ.get(
        "GAN_TPU_COMPILE_CACHE", os.path.join(repo, ".jax_cache"))
    cache_file = os.path.join(
        cache_dir, f"init_{hashlib.sha256(spec).hexdigest()[:24]}.msgpack")
    legacy_keys = (
        repr((sig, seed)).encode() + _stable_dumps((g_model, d_model)),
        repr((sig, seed)).encode(),
        _stable_dumps((g_model, d_model, seed, tuple(image_size))),
    )
    return template, cache_file, legacy_keys, (g_model, d_model)


def _bank_blob_from_classic(g_model, d_model, seed, batch_size, image_size):
    """Serialize a style-bank init blob from the classic-layout blob (same
    values, re-laid-out by style_bank.classic_to_bank). None if no classic
    blob exists."""
    import os

    import flax.serialization

    from gan_tpu.models import style_bank as sb

    classic = g_model.clone(style_bank=False)
    c_tmpl, c_file, _, _ = init_cache_info(
        classic, d_model, seed, batch_size, image_size)
    if not os.path.exists(c_file):
        return None
    with open(c_file, "rb") as f:
        c_vars = flax.serialization.from_bytes(c_tmpl, f.read())
    reg = sb.style_registry(g_model)
    c_vars["g"] = sb.classic_to_bank(c_vars["g"], reg)
    return flax.serialization.to_bytes(c_vars)


def ensure_init_blob(g_model, d_model, rng, batch_size, image_size):
    """Generate-only init path: make sure the init blob cache file exists
    (migrating legacy keys / deriving the style-bank layout / running the
    clean-CPU init worker as needed) WITHOUT deserializing the ~2 GB blob.
    Returns (template, cache_file) or None on failure. Callers that need
    the variables use _init_in_subprocess; tools that only want the cache
    file on disk (tools/regen_init_blob.py) use this and skip the
    minutes-long from_bytes pass (ADVICE r3)."""
    import os
    import pickle
    import subprocess
    import sys
    import tempfile

    import numpy as np

    try:
        # fold the key into a scalar seed for the worker; init
        # distributions are identical, exact cross-path key equality is
        # not required (and documented)
        try:
            key_arr = np.asarray(jax.random.key_data(rng))
        except TypeError:
            key_arr = np.asarray(rng)
        seed = int(key_arr.reshape(-1)[-1])
        import hashlib

        # Cache key = STRUCTURAL signature + normalized module signature
        # (init_cache_info docstring; ADVICE r2 medium). The worker inits
        # the NORMALIZED models so the blob layout matches the template.
        template, cache_file, legacy_keys, (g_model, d_model) = \
            init_cache_info(g_model, d_model, seed, batch_size, image_size)
        spec_tuple = (g_model, d_model, seed, batch_size, tuple(image_size))
        cache_dir = os.path.dirname(cache_file)
        os.makedirs(cache_dir, exist_ok=True)
        repo = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))

        # one-time migration from the older key schemes (r3 full-pickle
        # module hash, r2 structural-only, r1 stable-pickle): adopt-by-
        # rename, no copy
        if not os.path.exists(cache_file):
            for legacy_key in legacy_keys + (pickle.dumps(spec_tuple),):
                legacy = os.path.join(
                    cache_dir,
                    "init_"
                    + hashlib.sha256(legacy_key).hexdigest()[:24]
                    + ".msgpack",
                )
                if os.path.exists(legacy):
                    os.replace(legacy, cache_file)
                    break

        # style-bank layout (models/style_bank.py): derive the blob from
        # the CLASSIC blob when available — a pure re-layout (identical
        # values), vs ~30 min of fresh flagship init compute
        if not os.path.exists(cache_file) and getattr(
                g_model, "style_bank", False):
            blob = _bank_blob_from_classic(
                g_model, d_model, seed, batch_size, image_size)
            if blob is not None:
                tmp = cache_file + ".tmp"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, cache_file)

        if not os.path.exists(cache_file):
            with tempfile.TemporaryDirectory() as td:
                payload = os.path.join(td, "payload.pkl")
                out = os.path.join(td, "vars.msgpack")
                with open(payload, "wb") as f:
                    # the worker unpickles this: use a REAL pickle (the
                    # stable `spec` bytes are hash-only, FlaxIds zeroed)
                    f.write(pickle.dumps(spec_tuple))
                env = dict(os.environ)
                env["JAX_PLATFORMS"] = "cpu"
                # strip the axon compile-relay hooks: inherited, they route
                # even pure-CPU eager ops through per-op remote AOT compiles
                for k in list(env):
                    if "AXON" in k or k.startswith("PALLAS_"):
                        env.pop(k)
                env["PYTHONPATH"] = repo  # drop .axon_site sitecustomize
                worker = os.path.join(repo, "gan_tpu", "train",
                                      "_init_worker.py")
                res = subprocess.run(
                    [sys.executable, worker, payload, out],
                    env=env, capture_output=True, timeout=3600,
                )
                if res.returncode != 0:
                    return None
                with open(out, "rb") as f:
                    blob = f.read()
            tmp = cache_file + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, cache_file)
        return template, cache_file
    except Exception:
        return None


def _init_in_subprocess(g_model, d_model, rng, batch_size, image_size):
    """Model init in a JAX_PLATFORMS=cpu subprocess (see _init_worker.py).
    Returns {"g": vars, "d": vars} as numpy pytrees, or None on failure
    (caller falls back to in-process jitted init)."""
    import flax.serialization

    got = ensure_init_blob(g_model, d_model, rng, batch_size, image_size)
    if got is None:
        return None
    template, cache_file = got
    try:
        with open(cache_file, "rb") as f:
            blob = f.read()
        return flax.serialization.from_bytes(template, blob)
    except Exception:
        return None
