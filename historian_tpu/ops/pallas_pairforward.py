"""Pallas TPU kernel: 5-state pair-transducer Forward DP, one pair per
grid program, all DP state VMEM-resident.

Compared to the lax.scan kernel (ops/pairforward.py), this version keeps
the whole [X+1, Y+1] emission block and the running row vectors in VMEM
for the entire fill, avoiding per-step HBM traffic, and implements the
within-row IDM/IMI affine recurrences as explicit Hillis-Steele prefix
log-sum-exp scans (log2(Y) vector steps of roll+mask on the VPU).

Returns only the per-pair end log-likelihood (the progressive aligner's
band-doubling retry and best-path scoring need lp_end; full cell
matrices stay on the scan path when tracebacks are required).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _affine_scan_row(a, b, length):
    """u[j] = a[j] lse (u[j-1] + b[j]) as a Hillis-Steele scan over affine
    segment pairs (v, w): (vl, wl) o (vr, wr) = (lse(vr, vl + wr), wl + wr)
    with identity (-inf, 0).  log2(Y) roll+mask vector steps; avoids the
    cumsum formulation's huge intermediates when b holds -inf sentinels."""
    n_steps = max(1, int(math.ceil(math.log2(length))))
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, len(a.shape) - 1)
    v, w = a, b
    d = 1
    for _ in range(n_steps):
        axis = len(a.shape) - 1
        v_s = jnp.where(idx >= d, pltpu.roll(v, d, axis=axis), NEG)
        w_s = jnp.where(idx >= d, pltpu.roll(w, d, axis=axis), 0.0)
        v = jnp.logaddexp(v, v_s + w)
        w = jnp.maximum(w + w_s, NEG)  # cap so repeated sentinels stay finite
        d *= 2
    return v


def _kernel(absorb_ref, rsx_ref, rsy_ref, ix_ref, iy_ref, trans_ref, out_ref):
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (trans_ref[0, k] for k in range(23))

    X1 = absorb_ref.shape[1]
    Y1 = absorb_ref.shape[2]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, Y1), 1)
    neg_row = jnp.full((1, Y1), NEG, dtype=absorb_ref.dtype)
    rsy = rsy_ref[0]  # [1, Y1]
    iy = iy_ref[0]
    y_ready = col_idx < Y1 - 1

    def shift1(v):
        s = pltpu.roll(v, 1, axis=1)
        return jnp.where(col_idx >= 1, s, NEG)

    def body(i, carry):
        imm_p, imd_p, idm_p, imi_p, iiw_p = carry
        rsx_i = rsx_ref[0, 0, i]
        ix_i = ix_ref[0, 0, i]

        imd = jnp.logaddexp(
            jnp.logaddexp(imm_p + imm_imd, imd_p + imd_imd),
            jnp.logaddexp(idm_p + idm_imd, imi_p + imi_imd),
        ) + rsx_i
        iiw = jnp.logaddexp(
            jnp.logaddexp(imm_p + imm_iiw, imi_p + imi_iiw), iiw_p + iiw_iiw
        ) + ix_i
        imd = jnp.where(y_ready & (i > 0), imd, NEG)
        iiw = jnp.where(y_ready & (i > 0), iiw, NEG)

        imm_src = jnp.logaddexp(
            jnp.logaddexp(
                jnp.logaddexp(imm_p + imm_imm, imd_p + imd_imm),
                jnp.logaddexp(idm_p + idm_imm, imi_p + imi_imm),
            ),
            iiw_p + iiw_imm,
        )
        imm = shift1(imm_src) + absorb_ref[0, i]
        imm = jnp.where((i == 0) & (col_idx == 0), 0.0, jnp.where(i == 0, NEG, imm))

        x_ready = i < X1 - 1
        idm_other = jnp.logaddexp(
            jnp.logaddexp(imm + imm_idm, imd + imd_idm), iiw + iiw_idm
        )
        a_idm = jnp.where(x_ready, shift1(idm_other) + rsy, NEG)
        b_idm = jnp.where(x_ready, idm_idm + rsy, NEG)
        idm = _affine_scan_row(a_idm, b_idm, Y1)
        idm = jnp.where(x_ready, idm, NEG)

        a_imi = jnp.where(x_ready, shift1(imm + imm_imi) + iy, NEG)
        b_imi = jnp.where(x_ready, imi_imi + iy, NEG)
        imi = _affine_scan_row(a_imi, b_imi, Y1)
        imi = jnp.where(x_ready, imi, NEG)

        return imm, imd, idm, imi, iiw

    init = (neg_row, neg_row, neg_row, neg_row, neg_row)
    imm, imd, idm, imi, iiw = jax.lax.fori_loop(0, X1, body, init)

    lp_end = jnp.logaddexp(
        jnp.logaddexp(
            jnp.logaddexp(imm[0, Y1 - 1] + imm_eee, imd[0, Y1 - 1] + imd_eee),
            jnp.logaddexp(idm[0, Y1 - 1] + idm_eee, imi[0, Y1 - 1] + imi_eee),
        ),
        iiw[0, Y1 - 1] + iiw_eee,
    )
    out_ref[0, 0, 0] = lp_end


@functools.partial(jax.jit, static_argnames=())
def pallas_pair_forward_lp(absorb, rsx, rsy, ix, iy, trans):
    """Batched end log-likelihoods.

    absorb: [B, X+1, Y+1]; rsx/ix: [B, X+1]; rsy/iy: [B, Y+1]; trans: [23].
    Returns lp_end [B].
    """
    B = absorb.shape[0]
    x1, y1 = absorb.shape[1], absorb.shape[2]
    out = pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, x1, y1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, x1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, x1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, y1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 23), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), absorb.dtype),
    )(
        absorb,
        rsx.reshape(B, 1, x1),
        rsy.reshape(B, 1, y1),
        ix.reshape(B, 1, x1),
        iy.reshape(B, 1, y1),
        trans.reshape(1, 23),
    )
    return out[:, 0, 0]
