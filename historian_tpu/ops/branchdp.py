"""Device kernel: 3-state (Match/Insert/Delete) global branch alignment DP.

Used by the refiner (Viterbi variant) and the MCMC branch-realignment
moves (Forward variant) to align a parent position-weight matrix to a
child PWM along one branch (reference BranchMatrixBase,
sampler.cpp:1005-1160).  Same column-scan structure as ops/pairdp.py:

- scan over y columns; Match/Insert read the previous column (vector ops
  over x); Delete's within-column recursion is a (max,+) or (lse,+)
  prefix scan, segmented at envelope boundaries.

Emission scores are precomputed einsums: match[x, y] = logsumexp over
(c, a) of xSeq[x] + ySub[y]; insert emissions are a per-position vector.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e30

MATCH, INSERT, DELETE = 0, 1, 2


def _seg_combine_max(left, right):
    vl, fl = left
    vr, fr = right
    return jnp.where(fr, vr, jnp.maximum(vl, vr)), fl | fr


def _seg_combine_lse(left, right):
    vl, fl = left
    vr, fr = right
    return jnp.where(fr, vr, jnp.logaddexp(vl, vr)), fl | fr


def _branch_fill(match_emit, ins_emit, mask, trans, viterbi: bool):
    """match_emit [X+1, Y+1] (valid at x,y >= 1); ins_emit [Y+1];
    mask [X+1, Y+1]; trans [8] = mm, mi, md, im, ii, id, dm, dd.

    Returns cells [X+1, Y+1, 3] (Match, Insert, Delete).
    """
    mm, mi, md, im, ii, id_, dm, dd = (trans[k] for k in range(8))
    X1, Y1 = match_emit.shape
    dtype = match_emit.dtype
    neg = jnp.array(NEG, dtype)
    reduce2 = jnp.maximum if viterbi else jnp.logaddexp
    idx = jnp.arange(X1, dtype=dtype)
    combine = _seg_combine_max if viterbi else _seg_combine_lse

    def shift_down(v):
        return jnp.concatenate([jnp.full((1,), neg, dtype), v[:-1]])

    def step(carry, y):
        m_p, i_p, d_p = carry  # column y-1
        mask_col = mask[:, y]
        is_first = y == 0

        m = reduce2(reduce2(shift_down(m_p) + mm, shift_down(i_p) + im), shift_down(d_p) + dm)
        m = m + match_emit[:, y]
        m = jnp.where(is_first & (jnp.arange(X1) == 0), 0.0, jnp.where(is_first, neg, m))
        m = jnp.where(mask_col, m, neg)

        i = reduce2(m_p + mi, i_p + ii) + ins_emit[y]
        i = jnp.where(is_first, neg, jnp.where(mask_col, i, neg))

        # Delete: d[x] = reduce(base[x], d[x-1] + dd), base from current column
        base = reduce2(shift_down(m) + md, shift_down(i) + id_)
        if viterbi:
            z = jnp.where(mask_col, base - idx * dd, neg)
            flag = ~mask_col
            seg, _ = jax.lax.associative_scan(combine, (z, flag))
            d = jnp.where(mask_col, seg + idx * dd, neg)
        else:
            z = jnp.where(mask_col, base - idx * dd, neg)
            flag = ~mask_col
            seg, _ = jax.lax.associative_scan(combine, (z, flag))
            d = jnp.where(mask_col, seg + idx * dd, neg)
        return (m, i, d), (m, i, d)

    init = (jnp.full((X1,), neg, dtype),) * 3
    _, cols = jax.lax.scan(step, init, jnp.arange(Y1))
    # cols: tuple of 3 arrays, each [Y+1, X+1] -> [X+1, Y+1, 3]
    return jnp.stack(cols, axis=-1).transpose(1, 0, 2)


branch_viterbi = jax.jit(partial(_branch_fill, viterbi=True))
branch_forward = jax.jit(partial(_branch_fill, viterbi=False))
