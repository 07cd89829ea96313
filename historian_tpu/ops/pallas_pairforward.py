"""Pallas TPU kernel: 5-state pair-transducer Forward DP, G pairs per
grid program, all DP state VMEM-resident.

Compared to the lax.scan kernel (ops/pairforward.py), this version keeps
the whole [X+1, Y+1] emission block and the running row vectors in VMEM
for the entire fill, avoiding per-step HBM traffic, and implements the
within-row IDM/IMI affine recurrences as explicit Hillis-Steele prefix
log-sum-exp scans (log2(Y) vector steps of roll+mask on the VPU).
Packing G=8 pairs per program makes every row vector a full
[8 sublanes, Y+1 lanes] tile, so the VPU is fully utilised.

Returns only the per-pair end log-likelihood (the progressive aligner's
band-doubling retry and best-path scoring need lp_end; full cell
matrices stay on the scan path when tracebacks are required).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
F32_NEG = np.float32(NEG)
F32_ZERO = np.float32(0.0)
GROUP = 8  # pairs per grid program = f32 sublane count


def _affine_scan_row(a, b, length):
    """u[j] = a[j] lse (u[j-1] + b[j]) as a Hillis-Steele scan over affine
    segment pairs (v, w): (vl, wl) o (vr, wr) = (lse(vr, vl + wr), wl + wr)
    with identity (-inf, 0).  log2(Y) roll+mask vector steps; avoids the
    cumsum formulation's huge intermediates when b holds -inf sentinels."""
    n_steps = max(1, int(math.ceil(math.log2(length))))
    axis = len(a.shape) - 1
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    v, w = a, b
    d = 1
    for _ in range(n_steps):
        v_s = jnp.where(idx >= d, pltpu.roll(v, np.int32(d), axis=axis), F32_NEG)
        w_s = jnp.where(idx >= d, pltpu.roll(w, np.int32(d), axis=axis), F32_ZERO)
        v = jnp.logaddexp(v, v_s + w)
        w = jnp.maximum(w + w_s, F32_NEG)  # cap so repeated sentinels stay finite
        d *= 2
    return v


def _kernel(absorb_ref, rsx_ref, rsy_ref, ix_ref, iy_ref, trans_ref, out_ref):
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (trans_ref[0, k] for k in range(23))

    X1 = absorb_ref.shape[1]
    G = absorb_ref.shape[2]
    Y1 = absorb_ref.shape[3]
    rsx_rows = rsx_ref[0]  # [G, X1]
    ix_rows = ix_ref[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, X1), 1)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Y1), 1)
    neg_row = jnp.full((G, Y1), F32_NEG, dtype=absorb_ref.dtype)
    rsy = rsy_ref[0]  # [G, Y1]
    iy = iy_ref[0]
    y_ready = col_idx < Y1 - 1

    def shift1(v):
        s = pltpu.roll(v, np.int32(1), axis=1)
        return jnp.where(col_idx >= 1, s, F32_NEG)

    # row 0 explicitly: imm = start row; IDM/IMI scans seeded from it.
    # (boundary sentinels rsx[0]=ix[0]=-inf make the i>0 gates of IMD/IIW
    # unnecessary inside the loop, and the final-row x_ready gate is
    # applied after the loop -- no loop-index scalar branches remain.)
    start_row = jnp.where(col_idx == 0, F32_ZERO, neg_row)
    imm0 = start_row
    idm0 = _affine_scan_row(shift1(imm0 + imm_idm) + rsy, idm_idm + rsy, Y1)
    imi0 = _affine_scan_row(shift1(imm0 + imm_imi) + iy, imi_imi + iy, Y1)

    def body(i, carry):
        imm_p, imd_p, idm_p, imi_p, iiw_p, onehot = carry
        # extract row-i scalars by one-hot reduction (dynamic lane-dim
        # scalar loads from VMEM are not supported by Mosaic; the one-hot
        # is carried and rolled to avoid comparing against the loop index)
        sel = onehot > 0.5
        rsx_i = jnp.sum(
            jnp.where(sel, jnp.maximum(rsx_rows, F32_NEG), F32_ZERO),
            axis=1, keepdims=True,
        )  # [G, 1]
        ix_i = jnp.sum(
            jnp.where(sel, jnp.maximum(ix_rows, F32_NEG), F32_ZERO),
            axis=1, keepdims=True,
        )

        imd = jnp.logaddexp(
            jnp.logaddexp(imm_p + imm_imd, imd_p + imd_imd),
            jnp.logaddexp(idm_p + idm_imd, imi_p + imi_imd),
        ) + rsx_i
        iiw = jnp.logaddexp(
            jnp.logaddexp(imm_p + imm_iiw, imi_p + imi_iiw), iiw_p + iiw_iiw
        ) + ix_i
        imd = jnp.where(y_ready, imd, F32_NEG)
        iiw = jnp.where(y_ready, iiw, F32_NEG)

        imm_src = jnp.logaddexp(
            jnp.logaddexp(
                jnp.logaddexp(imm_p + imm_imm, imd_p + imd_imm),
                jnp.logaddexp(idm_p + idm_imm, imi_p + imi_imm),
            ),
            iiw_p + iiw_imm,
        )
        imm = shift1(imm_src) + absorb_ref[0, i]  # [G, Y1] row across pairs

        idm_other = jnp.logaddexp(
            jnp.logaddexp(imm + imm_idm, imd + imd_idm), iiw + iiw_idm
        )
        idm = _affine_scan_row(shift1(idm_other) + rsy, idm_idm + rsy, Y1)
        imi = _affine_scan_row(shift1(imm + imm_imi) + iy, imi_imi + iy, Y1)

        return imm, imd, idm, imi, iiw, pltpu.roll(onehot, np.int32(1), axis=1)

    onehot0 = (row_iota == 1).astype(rsx_rows.dtype)
    init = (imm0, neg_row, idm0, imi0, neg_row, onehot0)
    imm, imd, idm, imi, iiw, _ = jax.lax.fori_loop(1, X1, body, init)

    # final row: y-absorbing states are blocked (x is in its Wait state)
    lp_end = jnp.logaddexp(
        jnp.logaddexp(
            imm[:, Y1 - 1:Y1] + imm_eee, imd[:, Y1 - 1:Y1] + imd_eee
        ),
        iiw[:, Y1 - 1:Y1] + iiw_eee,
    )
    out_ref[0] = lp_end  # [G, 1]


@functools.partial(jax.jit, static_argnames=())
def pallas_pair_forward_lp(absorb, rsx, rsy, ix, iy, trans):
    """Batched end log-likelihoods.

    absorb: [B, X+1, Y+1]; rsx/ix: [B, X+1]; rsy/iy: [B, Y+1]; trans: [23].
    Returns lp_end [B].

    All pairs in a batch must share the same real (X, Y): the end
    log-likelihood is read at the block corner, so -inf-padding shorter
    pairs is NOT supported -- bucket pairs by shape instead.
    """
    B = absorb.shape[0]
    x1, y1 = absorb.shape[1], absorb.shape[2]
    G = GROUP
    NG = (B + G - 1) // G
    pad = NG * G - B
    if pad:
        # replicate the first pair into the tail slots (finite, discarded)
        absorb = jnp.concatenate([absorb, jnp.broadcast_to(absorb[:1], (pad, x1, y1))])
        rsx = jnp.concatenate([rsx, jnp.broadcast_to(rsx[:1], (pad, x1))])
        rsy = jnp.concatenate([rsy, jnp.broadcast_to(rsy[:1], (pad, y1))])
        ix = jnp.concatenate([ix, jnp.broadcast_to(ix[:1], (pad, x1))])
        iy = jnp.concatenate([iy, jnp.broadcast_to(iy[:1], (pad, y1))])
    # [NG, X1, G, Y1]: the DP row index lands on a leading (untiled) dim,
    # which Mosaic supports for dynamic indexing; G rides the sublanes.
    absorb_t = absorb.reshape(NG, G, x1, y1).transpose(0, 2, 1, 3)
    Z = np.int32(0)  # index maps must return i32 (x64 would make literals i64)
    out = pl.pallas_call(
        _kernel,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, x1, G, y1), lambda b: (b, Z, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, x1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, x1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 23), lambda b: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, G, 1), absorb.dtype),
    )(
        absorb_t,
        rsx.reshape(NG, G, x1),
        rsy.reshape(NG, G, y1),
        ix.reshape(NG, G, x1),
        iy.reshape(NG, G, y1),
        trans.reshape(1, 23),
    )
    return out.reshape(NG * G)[:B]


def _tiled_kernel(absorb_ref, rsx_ref, rsy_ref, ix_ref, iy_ref,
                  isstart_ref, islast_ref, trans_ref, out_ref,
                  imm_s, imd_s, idm_s, imi_s, iiw_s, lp_s):
    """X-tiled variant: the row loop runs over this tile's rows with the
    5-state row vectors carried in VMEM scratch across sequential grid
    steps, so absorb streams tile by tile instead of residing whole.
    Global row 0 (the start row) and the final row are signalled by the
    per-row isstart/islast inputs, extracted with the same rolled
    one-hot used for the emission scalars -- no loop-index branches."""
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (trans_ref[0, k] for k in range(23))

    xt = absorb_ref.shape[1]
    G = absorb_ref.shape[2]
    Y1 = absorb_ref.shape[3]
    tx = pl.program_id(1)
    rsx_rows = rsx_ref[0]   # [G, xt]
    ix_rows = ix_ref[0]
    isstart_row = isstart_ref[0]  # [1, xt]
    islast_row = islast_ref[0]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, xt), 1)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Y1), 1)
    neg_row = jnp.full((G, Y1), F32_NEG, dtype=absorb_ref.dtype)
    rsy = rsy_ref[0]
    iy = iy_ref[0]
    y_ready = col_idx < Y1 - 1

    @pl.when(tx == 0)
    def _init():
        imm_s[...] = neg_row
        imd_s[...] = neg_row
        idm_s[...] = neg_row
        imi_s[...] = neg_row
        iiw_s[...] = neg_row
        lp_s[...] = jnp.full((G, 1), F32_NEG, dtype=absorb_ref.dtype)

    def shift1(v):
        s = pltpu.roll(v, np.int32(1), axis=1)
        return jnp.where(col_idx >= 1, s, F32_NEG)

    def body(r, carry):
        # row state rides the loop carry; scratch is only touched at
        # tile boundaries (per-row VMEM round-trips stall the pipeline)
        imm_p, imd_p, idm_p, imi_p, iiw_p, onehot, lp_c = carry
        sel = onehot > 0.5
        rsx_i = jnp.sum(jnp.where(sel, jnp.maximum(rsx_rows, F32_NEG), F32_ZERO),
                        axis=1, keepdims=True)
        ix_i = jnp.sum(jnp.where(sel, jnp.maximum(ix_rows, F32_NEG), F32_ZERO),
                       axis=1, keepdims=True)
        s_start = jnp.sum(jnp.where(sel, isstart_row, F32_ZERO))
        s_last = jnp.sum(jnp.where(sel, islast_row, F32_ZERO))

        imd = jnp.logaddexp(
            jnp.logaddexp(imm_p + imm_imd, imd_p + imd_imd),
            jnp.logaddexp(idm_p + idm_imd, imi_p + imi_imd),
        ) + rsx_i
        iiw = jnp.logaddexp(
            jnp.logaddexp(imm_p + imm_iiw, imi_p + imi_iiw), iiw_p + iiw_iiw
        ) + ix_i
        imd = jnp.where(y_ready, imd, F32_NEG)
        iiw = jnp.where(y_ready, iiw, F32_NEG)

        imm_src = jnp.logaddexp(
            jnp.logaddexp(
                jnp.logaddexp(imm_p + imm_imm, imd_p + imd_imm),
                jnp.logaddexp(idm_p + idm_imm, imi_p + imi_imm),
            ),
            iiw_p + iiw_imm,
        )
        imm = shift1(imm_src) + absorb_ref[0, r]
        # global row 0: the start cell (0, 0) carries probability 1
        start_bonus = jnp.where(
            (col_idx == 0) & (s_start + jnp.zeros_like(imm) > 0.5), F32_ZERO, F32_NEG
        )
        imm = jnp.maximum(imm, start_bonus)

        idm_other = jnp.logaddexp(
            jnp.logaddexp(imm + imm_idm, imd + imd_idm), iiw + iiw_idm
        )
        idm = _affine_scan_row(shift1(idm_other) + rsy, idm_idm + rsy, Y1)
        imi = _affine_scan_row(shift1(imm + imm_imi) + iy, imi_imi + iy, Y1)

        # capture lp_end on the real final row (y-absorbers blocked there)
        lp_row = jnp.logaddexp(
            jnp.logaddexp(
                imm[:, Y1 - 1:Y1] + imm_eee, imd[:, Y1 - 1:Y1] + imd_eee
            ),
            iiw[:, Y1 - 1:Y1] + iiw_eee,
        )
        take = s_last + jnp.zeros_like(lp_row) > 0.5
        lp_c = jnp.where(take, lp_row, lp_c)
        return (imm, imd, idm, imi, iiw,
                pltpu.roll(onehot, np.int32(1), axis=1), lp_c)

    init = (imm_s[...], imd_s[...], idm_s[...], imi_s[...], iiw_s[...],
            (row_iota == 0).astype(absorb_ref.dtype), lp_s[...])
    imm, imd, idm, imi, iiw, _, lp_c = jax.lax.fori_loop(0, xt, body, init)
    imm_s[...] = imm
    imd_s[...] = imd
    idm_s[...] = idm
    imi_s[...] = imi
    iiw_s[...] = iiw
    lp_s[...] = lp_c
    out_ref[0] = lp_c


def pallas_pair_forward_lp_tiled(absorb, rsx, rsy, ix, iy, trans,
                                 x_tile: int = 512):
    """Batched end log-likelihoods with X streamed in tiles of x_tile
    rows: VMEM holds one absorb tile plus the carried row state, so X is
    unbounded (Y+1 must still fit a row vector; same uniform-shape
    batching contract as pallas_pair_forward_lp)."""
    B = absorb.shape[0]
    x1, y1 = absorb.shape[1], absorb.shape[2]
    G = GROUP
    x_tile = -(-x_tile // 128) * 128  # Mosaic: lane-dim block sizes are 128-multiples
    NG = (B + G - 1) // G
    padb = NG * G - B
    if padb:
        absorb = jnp.concatenate([absorb, jnp.broadcast_to(absorb[:1], (padb, x1, y1))])
        rsx = jnp.concatenate([rsx, jnp.broadcast_to(rsx[:1], (padb, x1))])
        rsy = jnp.concatenate([rsy, jnp.broadcast_to(rsy[:1], (padb, y1))])
        ix = jnp.concatenate([ix, jnp.broadcast_to(ix[:1], (padb, x1))])
        iy = jnp.concatenate([iy, jnp.broadcast_to(iy[:1], (padb, y1))])
    XT = (x1 + x_tile - 1) // x_tile
    padx = XT * x_tile - x1
    if padx:
        # padded rows carry -inf emissions; harmless, lp is captured at
        # the real final row before they run
        absorb = jnp.pad(absorb, ((0, 0), (0, padx), (0, 0)), constant_values=NEG)
        rsx = jnp.pad(rsx, ((0, 0), (0, padx)), constant_values=NEG)
        ix = jnp.pad(ix, ((0, 0), (0, padx)), constant_values=NEG)
    Xp = x1 + padx
    is_start = np.zeros((1, Xp), np.float32)
    is_start[0, 0] = 1.0
    is_last = np.zeros((1, Xp), np.float32)
    is_last[0, x1 - 1] = 1.0

    absorb_t = absorb.reshape(NG, G, Xp, y1).transpose(0, 2, 1, 3)
    dtype = absorb.dtype
    Z = np.int32(0)
    out = pl.pallas_call(
        _tiled_kernel,
        grid=(NG, XT),
        in_specs=[
            pl.BlockSpec((1, x_tile, G, y1), lambda b, t: (b, t, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, x_tile), lambda b, t: (b, Z, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b, t: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, x_tile), lambda b, t: (b, Z, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b, t: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x_tile), lambda b, t: (Z, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x_tile), lambda b, t: (Z, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 23), lambda b, t: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 1), lambda b, t: (b, Z, Z), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, G, 1), dtype),
        scratch_shapes=[
            pltpu.VMEM((G, y1), dtype), pltpu.VMEM((G, y1), dtype),
            pltpu.VMEM((G, y1), dtype), pltpu.VMEM((G, y1), dtype),
            pltpu.VMEM((G, y1), dtype), pltpu.VMEM((G, 1), dtype),
        ],
    )(
        absorb_t,
        rsx.reshape(NG, G, Xp),
        rsy.reshape(NG, G, y1),
        ix.reshape(NG, G, Xp),
        iy.reshape(NG, G, y1),
        jnp.asarray(is_start, dtype),
        jnp.asarray(is_last, dtype),
        trans.reshape(1, 23),
    )
    return out.reshape(NG * G)[:B]
