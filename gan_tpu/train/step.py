"""Jitted alternating D/G train step builder.

One step = the reference's per-batch body (/root/reference/train/
wganlazygpR2.py:48-77 + generator_trainstep): D update (losses + penalties,
separate gradient terms summed — mathematically identical to the reference's
separate .backward() accumulation), then G update against the *updated* D.

TPU-first details:
- Whole step compiled once per (apply_penalties,) variant; the lazy cadence
  (step %% k) is resolved on the host so no lax.cond sits around the
  double-backward graph.
- donate_argnums=0 donates the state pytree (in-place update, no HBM copy).
- Mutable collections (BN stats, SN u-vectors) thread functionally: the real
  forward's updates feed the fake forward, mirroring torch's in-place update
  order; penalty forwards discard stat updates (running stats never affect
  training math, and SN sigma drift within a step is below torch's own
  per-forward power-iteration noise).
"""

import functools
import os
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from gan_tpu.objectives import Objective
from gan_tpu.objectives import losses as L
from gan_tpu.objectives import penalties as P
from gan_tpu.train.state import GANTrainState


class TrainStep(NamedTuple):
    """Compiled step pair: with and without the lazy penalty branch.

    cadence: one compiled program running a full lazy interval on-device —
    the penalty step then lax.scan over the k-1 plain steps. One host
    dispatch per k steps (per-step dispatch over the axon relay costs a
    host->service round trip each; the reference's host hot loop,
    wganlazygpR2.py:75, has no TPU analogue). Call as
    cadence(state, batches, rngs) with batches (k, B, H, W, C) and rngs
    (k,) stacked PRNG keys; metrics come back stacked along axis 0."""

    with_penalties: Callable
    without_penalties: Callable
    lazy_interval: int
    cadence: Optional[Callable] = None
    parts_map: Optional[Dict[str, Dict[str, Callable]]] = None

    def __call__(self, state: GANTrainState, batch, rng, step_in_epoch: int):
        """Dispatch on the reference's host-side cadence (idx %% k == 0)."""
        if self.lazy_interval <= 1 or step_in_epoch % self.lazy_interval == 0:
            return self.with_penalties(state, batch, rng)
        return self.without_penalties(state, batch, rng)

    def parts(self, variant: str) -> Optional[Dict[str, Callable]]:
        """Split-step mode only: the individually-jitted sub-programs of a
        variant ('pen'/'nopen'), for lowering/size/memory tools."""
        return self.parts_map.get(variant) if self.parts_map else None


def _merge(base: Dict, updates) -> Dict:
    out = dict(base)
    out.update(dict(updates))
    return out


def build_train_step(
    g_model,
    d_model,
    objective: Objective,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    jit: bool = True,
    in_shardings=None,
    out_shardings=None,
    guard: Optional[bool] = None,
) -> TrainStep:
    """guard: wrap every step variant in utils.guards.finite_guard — a
    non-finite metric skips the whole update on-device (params/opt/state
    roll back via jnp.where select) and metrics gain 'skipped' (0/1).
    None reads GAN_TPU_FINITE_GUARD (default off: the guard changes the
    step HLO, so flipping it invalidates the warm flagship compile cache —
    same re-prewarm rule as the other program levers, docs/STATUS.md)."""
    obj = objective
    z_dim = g_model.z_dim
    k = float(obj.lazy_interval)

    def g_forward(g_params, g_state, z, noise_rng, mutable: bool):
        keys = list(g_state.keys())
        out = g_model.apply(
            {"params": g_params, **g_state},
            z,
            train=True,
            rngs={"noise": noise_rng},
            mutable=keys,
        )
        imgs, mut = out
        return imgs, (_merge(g_state, mut) if mutable else g_state)

    def d_forward(d_params, d_state, x, update: bool):
        """Single D forward. Always applies with mutable collections (BN
        needs it in train mode); returns updates only when update=True."""
        keys = list(d_state.keys())
        pred, mut = d_model.apply(
            {"params": d_params, **d_state},
            x,
            train=True,
            update_sn=update,
            mutable=keys,
        )
        return pred, (_merge(d_state, mut) if update else d_state)

    def d_update(state: GANTrainState, batch, rng, apply_penalties: bool):
        b = batch.shape[0]
        rng_z, rng_lbl_r, rng_lbl_f, rng_gp, rng_mix, rng_noise = (
            jax.random.split(rng, 6)
        )
        # fresh fakes from current G, detached (torch no_grad forward,
        # wgangp.py:58-60); G stats not updated by this forward.
        z = jax.random.normal(rng_z, (b, z_dim), batch.dtype)
        fake, _ = g_forward(state.g_params, state.g_state, z, rng_noise,
                            mutable=False)
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            metrics = {}
            d_state = state.d_state

            # ---- real side ----
            if apply_penalties and obj.r1 > 0:
                def real_fwd(x):
                    pred, new_state = d_forward(d_params, d_state, x, update=True)
                    return jnp.sum(pred), (pred, new_state)

                gx, (pred_r, d_state) = jax.grad(real_fwd, has_aux=True)(batch)
                g2_r = jnp.sum(jnp.square(gx).reshape(b, -1), axis=1)
                r1_term = k * obj.r1 * jnp.mean(g2_r)
            else:
                pred_r, d_state = d_forward(d_params, d_state, batch, update=True)
                r1_term = jnp.zeros((), batch.dtype)

            if obj.loss == "bce":
                real_loss = L.d_real_loss_bce(rng_lbl_r, pred_r)
            else:
                real_loss = L.d_real_loss_wass(pred_r)

            # ---- fake side ----
            if apply_penalties and obj.r2 > 0:
                def fake_fwd(x):
                    pred, new_state = d_forward(d_params, d_state, x, update=True)
                    return jnp.sum(pred), (pred, new_state)

                gx, (pred_f, d_state) = jax.grad(fake_fwd, has_aux=True)(fake)
                g2_f = jnp.sum(jnp.square(gx).reshape(b, -1), axis=1)
                r2_term = k * obj.r2 * jnp.mean(g2_f)
            else:
                pred_f, d_state = d_forward(d_params, d_state, fake, update=True)
                r2_term = jnp.zeros((), batch.dtype)

            if obj.loss == "bce":
                fake_loss = L.d_fake_loss_bce(rng_lbl_f, pred_f)
            else:
                fake_loss = L.d_fake_loss_wass(pred_f)

            # ---- mixup (see Objective.mixup_alpha) ----
            if obj.mixup_alpha > 0:
                from gan_tpu.data.augment import mixup_wgan

                mixed, label = mixup_wgan(rng_mix, batch, fake, obj.mixup_alpha)
                pred_m, d_state = d_forward(d_params, d_state, mixed, update=False)
                if obj.loss == "bce":
                    mix_loss = L.bce(pred_m, label.astype(pred_m.dtype))
                else:
                    w_signed = (2.0 * label - 1.0).astype(pred_m.dtype)
                    mix_loss = jnp.mean(w_signed * (-pred_m))
                metrics["mixup"] = mix_loss
            else:
                mix_loss = jnp.zeros((), batch.dtype)

            # ---- gradient penalty ----
            if apply_penalties and obj.gp > 0:
                d_pure = lambda x: d_forward(d_params, d_state, x, update=False)[0]
                gp_term = k * obj.gp * P.gradient_penalty(
                    d_pure, rng_gp, batch, fake, center=obj.gp_center
                )
            else:
                gp_term = jnp.zeros((), batch.dtype)

            loss = real_loss + fake_loss + r1_term + r2_term + gp_term + mix_loss
            metrics.update(
                real_loss=real_loss,
                fake_loss=fake_loss,
                r1=r1_term,
                r2=r2_term,
                gp=gp_term,
            )
            return loss, (d_state, metrics)

        grads, (d_state, metrics) = jax.grad(loss_fn, has_aux=True)(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        if obj.weight_clip is not None:
            c = obj.weight_clip
            # torch clamps every discriminator parameter (wgan.py:47-48)
            d_params = jax.tree_util.tree_map(lambda p: jnp.clip(p, -c, c), d_params)
        return state.replace(d_params=d_params, d_state=d_state, d_opt=d_opt), metrics

    def g_update(state: GANTrainState, batch_shape_b, dtype, rng):
        rng_z, rng_noise, rng_lbl = jax.random.split(rng, 3)
        z = jax.random.normal(rng_z, (batch_shape_b, z_dim), dtype)

        def loss_fn(g_params):
            fake, g_state = g_forward(g_params, state.g_state, z, rng_noise, mutable=True)
            # D forward against updated D; D stats not updated here.
            # GAN_TPU_G_DFWD_REMAT=1: rematerialize the whole D forward in
            # the backward pass instead of keeping its activations live —
            # the G-update program is the HBM blocker for batch scaling
            # (b20 misses by 137 MB, docs/STATUS.md r4); identical math.
            if os.environ.get("GAN_TPU_G_DFWD_REMAT", "0") == "1":
                pred = jax.checkpoint(
                    lambda f: d_forward(state.d_params, state.d_state, f,
                                        update=False)[0])(fake)
            else:
                pred, _ = d_forward(state.d_params, state.d_state, fake,
                                    update=False)
            if obj.loss == "bce":
                loss = L.g_loss_bce(rng_lbl, pred)
            else:
                loss = L.g_loss_wass(pred)
            return loss, g_state

        (g_loss, g_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return (
            state.replace(g_params=g_params, g_state=g_state, g_opt=g_opt),
            {"g_loss": g_loss},
        )

    def step(state: GANTrainState, batch, rng, apply_penalties: bool):
        rng_d, rng_g = jax.random.split(rng)
        state, d_metrics = d_update(state, batch, rng_d, apply_penalties)
        state, g_metrics = g_update(state, batch.shape[0], batch.dtype, rng_g)
        metrics = {**d_metrics, **g_metrics}
        state = state.replace(step=state.step + 1)
        return state, metrics

    guard_on = (guard if guard is not None
                else os.environ.get("GAN_TPU_FINITE_GUARD", "0") == "1")
    if guard_on:
        # inside the (to-be-jitted) program: the rollback select fuses with
        # the optimizer update; wrapping OUTSIDE jit would read donated
        # buffers. SURVEY SS5.3 failure detection, wired per VERDICT r3 #5.
        from gan_tpu.utils.guards import finite_guard

        step = finite_guard(step)

    def cadence(state: GANTrainState, batches, rngs):
        """One full lazy interval per dispatch: step 0 with penalties, then
        scan the k-1 penalty-free steps (same HLO as the two single-step
        programs combined — scan reuses one body)."""
        state, m0 = step(state, batches[0], rngs[0], apply_penalties=True)
        if obj.lazy_interval <= 1:
            return state, jax.tree_util.tree_map(lambda a: a[None], m0)

        def body(s, xs):
            b, r = xs
            s, m = step(s, b, r, apply_penalties=False)
            return s, m

        state, ms = jax.lax.scan(body, state, (batches[1:], rngs[1:]))
        metrics = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b]), m0, ms
        )
        return state, metrics

    # --- split-step mode (GAN_TPU_SPLIT_STEP=1): D-update and G-update as
    # two separately-jitted programs chained by state donation. Identical
    # math (each derives its half of the same rng split), two dispatches
    # instead of one (~ms of host overhead vs ~1 s of device time on the
    # flagship). Why: the axon remote compile helper is memory-capped at
    # ~35 MB of MLIR per program (docs/STATUS.md r3 "perf levers") — the
    # monolithic pen step is the program that hits it. Splitting also
    # DEDUPLICATES the G-update: one shared G program serves both the pen
    # and nopen variants (the monolithic layout compiles it twice).
    def d_step(state: GANTrainState, batch, rng, apply_penalties: bool):
        rng_d, _ = jax.random.split(rng)
        return d_update(state, batch, rng_d, apply_penalties)

    def g_step(state: GANTrainState, batch, rng):
        _, rng_g = jax.random.split(rng)
        state, g_metrics = g_update(state, batch.shape[0], batch.dtype, rng_g)
        return state.replace(step=state.step + 1), g_metrics

    if guard_on:
        from gan_tpu.utils.guards import finite_guard

        d_step = finite_guard(d_step)
        g_step = finite_guard(g_step)

    split = os.environ.get("GAN_TPU_SPLIT_STEP", "0") == "1" and (
        in_shardings is None and out_shardings is None
    )

    step_pen = functools.partial(step, apply_penalties=True)
    step_nopen = functools.partial(step, apply_penalties=False)
    parts_map = None
    if jit:
        jit_kwargs = {}
        if in_shardings is not None:
            jit_kwargs["in_shardings"] = in_shardings
        if out_shardings is not None:
            jit_kwargs["out_shardings"] = out_shardings
        from gan_tpu.utils.cache import fast_compile_options

        opts = fast_compile_options()
        if opts:
            try:
                step_try = jax.jit(step_pen, donate_argnums=0,
                                   compiler_options=opts, **jit_kwargs)
                jit_kwargs["compiler_options"] = opts
                step_pen = step_try
            except Exception:
                step_pen = jax.jit(step_pen, donate_argnums=0, **jit_kwargs)
        else:
            step_pen = jax.jit(step_pen, donate_argnums=0, **jit_kwargs)
        step_nopen = (
            jax.jit(step_nopen, donate_argnums=0, **jit_kwargs)
            if obj.lazy_interval > 1
            else step_pen
        )
        if split:
            cad_opts = {
                k_: v for k_, v in jit_kwargs.items()
                if k_ == "compiler_options"
            }
            d_pen = jax.jit(functools.partial(d_step, apply_penalties=True),
                            donate_argnums=0, **cad_opts)
            d_nopen = jax.jit(functools.partial(d_step, apply_penalties=False),
                              donate_argnums=0, **cad_opts)
            g_jit = jax.jit(g_step, donate_argnums=0, **cad_opts)

            def chain(d_fn):
                def run(state, batch, rng):
                    state, dm = d_fn(state, batch, rng)
                    state, gm = g_jit(state, batch, rng)
                    m = {**dm, **gm}
                    if "skipped" in dm and "skipped" in gm:
                        # either half skipping marks the step skipped
                        m["skipped"] = jnp.maximum(dm["skipped"],
                                                   gm["skipped"])
                    return state, m

                return run

            step_pen = chain(d_pen)
            step_nopen = chain(d_nopen) if obj.lazy_interval > 1 else step_pen
            parts_map = {
                "pen": {"d": d_pen, "g": g_jit},
                "nopen": {"d": d_nopen, "g": g_jit},
            }
        # cadence takes stacked (k, ...) batch/rng args, so the per-step
        # in/out shardings don't apply to it; GSPMD propagates from state.
        cad_kwargs = {
            k_: v for k_, v in jit_kwargs.items() if k_ == "compiler_options"
        }
        cadence = jax.jit(cadence, donate_argnums=0, **cad_kwargs)
    return TrainStep(step_pen, step_nopen, obj.lazy_interval, cadence,
                     parts_map)
