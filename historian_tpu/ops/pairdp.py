"""Banded pairwise Viterbi DP kernel.

TPU-native counterpart of the reference's QuickAlignMatrix fill
(/root/reference/src/quickalign.cpp:52-99).  The reference iterates cell
by cell inside a sparse diagonal envelope; here the fill is a lax.scan
over y-columns with every x-row computed in parallel on the VPU:

- Match/Insert depend only on the previous column -> pure vector ops.
- Delete's within-column recursion del[i] = max(base[i], del[i-1]+d2d)
  has a constant extension penalty, so it collapses to a running-max:
  del = cummax(base - i*d2d) + i*d2d  (max-plus prefix scan).

The diagonal envelope enters as a dense [X+1, Y+1] mask (out-of-band
cells pinned to -inf), preserving the sparse C++ semantics while keeping
shapes static for XLA.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # avoid actual -inf: (-inf) - (-inf) NaNs in backward passes


@partial(jax.jit, static_argnames=())
def banded_viterbi_fill(
    emit,  # [X+1, Y+1]: emit[i, j] = match emission log-odds at (i, j); rows/cols 0 unused
    mask,  # [X+1, Y+1] bool envelope
    start_gap,  # [X+1, Y+1]: startGapScore(i, j)
    trans,  # [10]: m2m, m2i, m2d, i2i, i2m, i2d, d2d, d2m, unused, unused
):
    """Returns (mat, ins, del) each [Y+1, X+1] (column-major stack)."""
    m2m, m2i, m2d, i2i, i2m, i2d, d2d, d2m = (trans[k] for k in range(8))
    X1 = emit.shape[0]
    Y1 = emit.shape[1]
    dtype = emit.dtype
    neg = jnp.array(NEG_INF, dtype)
    idx = jnp.arange(X1, dtype=dtype)

    col0 = jnp.full((X1,), neg, dtype)

    def shift_down(v):
        return jnp.concatenate([jnp.full((1,), neg, dtype), v[:-1]])

    def step(carry, j):
        m_prev, i_prev, d_prev = carry  # column j-1
        mask_col = mask[:, j]
        m_prev_sh = shift_down(m_prev)
        i_prev_sh = shift_down(i_prev)
        d_prev_sh = shift_down(d_prev)

        m_cand = jnp.maximum(
            jnp.maximum(m_prev_sh + m2m, d_prev_sh + d2m), i_prev_sh + i2m
        )
        m_cand = jnp.maximum(m_cand, start_gap[:, j])
        m = jnp.where(mask_col, m_cand + emit[:, j], neg)

        ins = jnp.where(mask_col, jnp.maximum(i_prev + i2i, m_prev + m2i), neg)

        # del[i] = max(base[i], del[i-1] + d2d): a max-plus prefix scan with
        # constant increment, but the chain must BREAK at out-of-envelope
        # cells (sparse-storage semantics) -> segmented running max via
        # associative_scan with "segment boundary" flags at masked cells.
        base = jnp.maximum(shift_down(ins) + i2d, shift_down(m) + m2d)
        z = jnp.where(mask_col, base - idx * d2d, neg)
        flag = ~mask_col

        def seg_combine(left, right):
            vl, fl = left
            vr, fr = right
            return jnp.where(fr, vr, jnp.maximum(vl, vr)), fl | fr

        seg_max, _ = jax.lax.associative_scan(seg_combine, (z, flag))
        d = jnp.where(mask_col, seg_max + idx * d2d, neg)

        return (m, ins, d), (m, ins, d)

    (_, _, _), (mats, inss, dels) = jax.lax.scan(
        step, (col0, col0, col0), jnp.arange(1, Y1)
    )
    # prepend column 0
    mats = jnp.concatenate([col0[None, :], mats], axis=0)
    inss = jnp.concatenate([col0[None, :], inss], axis=0)
    dels = jnp.concatenate([col0[None, :], dels], axis=0)
    return mats, inss, dels  # [Y+1, X+1]
