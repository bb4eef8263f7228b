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
- "pallas": fused flash-style forward kernel — per (batch, query-tile) the
  scores live only in VMEM; HBM traffic drops from O(N^2) to O(N*E).
  First-order autodiff via a custom VJP whose backward recomputes the
  softmax with plain einsums (same memory profile as the einsum path's
  backward; the forward fusion is the win). NOT twice-differentiable:
  keep "einsum" for discriminators trained with gradient penalties.

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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    # q: (1, TQ, E), k/v: (1, N, E) — N*E is small enough (<= 4096*512) that
    # whole K/V blocks sit in VMEM; only the (TQ, N) score tile is ever
    # materialized, and only on-chip.
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, N): s[j, i] = q_j . k_i
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pallas_forward(q, k, v, block_q: int, interpret: bool):
    b, n, e = q.shape
    tq = min(block_q, n)
    grid = (b, pl.cdiv(n, tq))
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, e), lambda ib, jq: (ib, jq, 0)),
            pl.BlockSpec((1, n, e), lambda ib, jq: (ib, 0, 0)),
            pl.BlockSpec((1, n, e), lambda ib, jq: (ib, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tq, e), lambda ib, jq: (ib, jq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, e), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_attention(q, k, v, block_q, interpret):
    return _pallas_forward(q, k, v, block_q, interpret)


def _pallas_attention_fwd(q, k, v, block_q, interpret):
    return _pallas_forward(q, k, v, block_q, interpret), (q, k, v)


def _pallas_attention_bwd(block_q, interpret, res, do):
    # Recompute-softmax backward in plain einsums (first-order only; the
    # einsum impl is kept for the double-backward objectives).
    q, k, v = res
    s = jnp.einsum("bje,bie->bji", q, k)  # (B, NQ, NK)
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bji,bje->bie", p, do)
    dp = jnp.einsum("bje,bie->bji", do, v)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bji,bie->bje", ds, k)
    dk = jnp.einsum("bji,bje->bie", ds, q)
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
