"""SAGAN spatial attention core, shared by every zoo attention variant.

The reference computes (generator_9.py:16-31, generator_13.py:329-341,
discriminator_9.py:68-80, generator_12.py:131-150 — all identical math):

    s[i, j] = <key_i, query_j>        # s = einsum('bie,bje->bij', f, g)
    beta    = softmax(s, dim=1)       # normalized over the KEY index i
    out_j   = sum_i value_i * beta[i, j]

i.e. standard attention with Q = g, K = f, V = hx and the softmax taken
over keys — the reference's "softmax-dim=1 quirk" is, in this orientation,
exactly a row softmax of Q K^T. No 1/sqrt(d) scaling (parity).

Two implementations:

- "einsum": the literal three-line translation. Materializes the (N, N)
  score matrix in HBM (N = H*W <= 4096). Supports arbitrary-order autodiff
  (needed for the R1/GP grad-of-grad objectives when attention sits inside
  the discriminator, e.g. D9 under wgangp).
- "pallas": fused flash-style kernels, forward AND backward — per
  (batch, tile) the score matrix lives only in VMEM; HBM traffic drops
  from O(N^2) to O(N*E) in both directions (FlashAttention-2 scheme: the
  forward emits per-row log-sum-exp, the backward recomputes softmax per
  tile; dq from query tiles, dk/dv from key tiles, delta = rowsum(dO*O)).
  First-order autodiff only — NOT twice-differentiable: keep "einsum" for
  discriminators trained with gradient penalties.

Default resolution order: explicit `impl` arg > GAN_TPU_ATTN_IMPL env var
> "einsum".
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attention_core"]


def _einsum_core(f, g, hx):
    s = jnp.einsum("bie,bje->bij", f, g)
    beta = jax.nn.softmax(s, axis=1)
    return jnp.einsum("bie,bij->bje", hx, beta)


# ---------------------------------------------------------------------------
# Pallas forward kernel
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref):
    # q: (1, TQ, E), k/v: (1, N, E) — N*E is small enough (<= 4096*512) that
    # whole K/V blocks sit in VMEM; only the (TQ, N) score tile is ever
    # materialized, and only on-chip. Also emits the row log-sum-exp for
    # the FlashAttention-2-style backward.
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N): s[j, i] = q_j . k_i
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    o = jnp.dot(p / l, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(l)).reshape(-1)


def _pallas_forward(q, k, v, block_q: int, interpret: bool):
    b, n, e = q.shape
    tq = min(block_q, n)
    grid = (b, pl.cdiv(n, tq))
    return pl.pallas_call(
        _attn_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, e), lambda ib, jq: (ib, jq, 0)),
            pl.BlockSpec((1, n, e), lambda ib, jq: (ib, 0, 0)),
            pl.BlockSpec((1, n, e), lambda ib, jq: (ib, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, e), lambda ib, jq: (ib, jq, 0)),
            # lse rides as (b, 1, n): a 2-D (1, tq) block violates
            # Mosaic's last-two-dims rule (second-to-last must be
            # divisible by 8 or full) whenever b > 1; the singleton
            # middle dim makes the block's second-to-last dim full.
            pl.BlockSpec((1, 1, tq), lambda ib, jq: (ib, 0, jq)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, e), q.dtype),
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v)


def _attn_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref):
    # per (batch, q-tile): dp = dO V^T; ds = p * (dp - delta); dq = ds K
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N)
    p = jnp.exp(s - lse_ref[0, 0].reshape(-1, 1))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N)
    ds = p * (dp - delta_ref[0, 0].reshape(-1, 1))
    dq_ref[0] = jnp.dot(ds, k, preferred_element_type=jnp.float32).astype(
        dq_ref.dtype
    )


def _attn_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                     dk_ref, dv_ref):
    # per (batch, k-tile): p2[i, j] = exp(q_j . k_i - lse_j);
    # dv = p2 dO; dp2 = V_t dO^T; ds2 = p2 * (dp2 - delta); dk = ds2 Q
    qf = q_ref[0].astype(jnp.float32)       # (N, E)
    kt = k_ref[0].astype(jnp.float32)       # (TK, E)
    vt = v_ref[0].astype(jnp.float32)       # (TK, E)
    do = do_ref[0].astype(jnp.float32)      # (N, E)
    s2 = jax.lax.dot_general(
        kt, qf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TK, N)
    p2 = jnp.exp(s2 - lse_ref[0, 0].reshape(1, -1))
    dv_ref[0] = jnp.dot(p2, do, preferred_element_type=jnp.float32).astype(
        dv_ref.dtype
    )
    dp2 = jax.lax.dot_general(
        vt, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TK, N)
    ds2 = p2 * (dp2 - delta_ref[0, 0].reshape(1, -1))
    dk_ref[0] = jnp.dot(ds2, qf, preferred_element_type=jnp.float32).astype(
        dk_ref.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_attention(q, k, v, block_q, interpret):
    o, _ = _pallas_forward(q, k, v, block_q, interpret)
    return o


def _pallas_attention_fwd(q, k, v, block_q, interpret):
    o, lse = _pallas_forward(q, k, v, block_q, interpret)
    return o, (q, k, v, o, lse)


def _pallas_attention_bwd(block_q, interpret, res, do):
    # FlashAttention-2-style backward: softmax recomputed per tile from the
    # saved row log-sum-exp; nothing (N, N)-shaped ever reaches HBM.
    # First-order only; the einsum impl is kept for the double-backward
    # objectives.
    q, k, v, o, lse = res
    b, n, e = q.shape
    t = min(block_q, n)
    # Each backward kernel holds ~4 (t, n) f32 score-sized temps on the
    # VMEM stack (s/p/dp/ds); at n=4096, t=256 that is 16.8 MB — over the
    # 16 MB scoped-vmem limit (measured live). Shrink the tile until the
    # score temps fit in ~8 MB, leaving room for the full-row q/do blocks.
    while t > 8 and 4 * t * n * 4 > 8 * 2**20:
        t //= 2
    grid = (b, pl.cdiv(n, t))
    # delta rides (b, 1, n) like lse (Mosaic last-two-dims rule, see fwd)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]

    full = lambda ib, jt: (ib, 0, 0)
    tile = lambda ib, jt: (ib, jt, 0)
    row_tile = lambda ib, jt: (ib, 0, jt)
    row_full = lambda ib, jt: (ib, 0, 0)

    dq = pl.pallas_call(
        _attn_dq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, e), tile),      # q
            pl.BlockSpec((1, n, e), full),      # k
            pl.BlockSpec((1, n, e), full),      # v
            pl.BlockSpec((1, t, e), tile),      # do
            pl.BlockSpec((1, 1, t), row_tile),  # lse
            pl.BlockSpec((1, 1, t), row_tile),  # delta
        ],
        out_specs=pl.BlockSpec((1, t, e), tile),
        out_shape=jax.ShapeDtypeStruct((b, n, e), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        _attn_dkv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, e), full),      # q (full)
            pl.BlockSpec((1, t, e), tile),      # k tile
            pl.BlockSpec((1, t, e), tile),      # v tile
            pl.BlockSpec((1, n, e), full),      # do (full)
            pl.BlockSpec((1, 1, n), row_full),  # lse (full rows)
            pl.BlockSpec((1, 1, n), row_full),  # delta (full rows)
        ],
        out_specs=(
            pl.BlockSpec((1, t, e), tile),
            pl.BlockSpec((1, t, e), tile),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, e), k.dtype),
            jax.ShapeDtypeStruct((b, n, e), v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


_pallas_attention.defvjp(_pallas_attention_fwd, _pallas_attention_bwd)


def _default_impl() -> str:
    return os.environ.get("GAN_TPU_ATTN_IMPL", "einsum")


def attention_core(f, g, hx, *, impl: str = None, block_q: int = 256,
                   interpret: bool = None):
    """Shared attention core. f = keys, g = queries, hx = values, each
    (B, N, E); returns (B, N, E) in the reference's orientation
    (out[j] = sum_i softmax_i(<f_i, g_j>) * hx_i).

    impl: "einsum" (default; any-order autodiff) or "pallas" (fused
    forward, first-order autodiff only).
    """
    if impl is None:
        impl = _default_impl()
    if impl == "einsum":
        return _einsum_core(f, g, hx)
    if impl != "pallas":
        raise ValueError(f"unknown attention impl: {impl!r}")
    if interpret is None:
        # Mosaic only lowers on real TPU backends; interpret elsewhere (CPU
        # tests). The axon PJRT plugin fronts an XLA:TPU compile service.
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _pallas_attention(g, f, hx, block_q, interpret)
