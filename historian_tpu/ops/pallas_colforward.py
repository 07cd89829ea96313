"""Pallas TPU kernel: column-major Forward DP (chain x, DAG y) with the
whole working set VMEM-resident.

The XLA version (ops/colforward.py) pays per-op dispatch for each of
the ~40 vector ops + 2 associative scans in every column step -- about
1ms per column through the scan machinery.  Here one grid step IS one
column: straight-line VPU code plus two Hillis-Steele affine scans over
the SX lanes, so a ~700-column gp120 merge is a few milliseconds.

Key structures:

- cells ride a RING BUFFER of the last 128 columns in VMEM,
  [RING, 8, SX] (5 state planes padded to 8 sublanes): y in-edge
  gathers become dynamic leading-dim reads at slot src % RING.  The
  bridge routes to this kernel only when every in-edge distance is
  <= RING-1 (measured gp120 max 109, p99 27); longer-range profiles
  fall back to the XLA kernel.
- per-column scalars (in-edge sources/log-probs, null/ready flags,
  rootsub/ins) come in through scalar prefetch (SMEM), so no one-hot
  lane tricks are needed; per-ROW vectors (rootsub_x, ins_x, gates,
  absorb column, mask column) are [SX]-lane VPU operands.
- the five output planes stream to HBM one [1, SX] row per grid step.

Matches ops/colforward.py::col_pair_forward_cells exactly in exact
arithmetic; f32 rounding differs by reassociation only (pinned by
tests/test_pallas.py in interpret mode and tests/test_tpu_hw.py
compiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
F32_NEG = np.float32(NEG)
RING = 128  # columns of look-back held in VMEM (>= max in-edge distance + 1)
CPB = 8  # columns per grid step (Mosaic block sublane minimum for f32)
#: largest SX the kernel fits in VMEM: the ring scratch alone is
#: RING*8*SX*4 B = 4096*SX (12.6 MB at 3072) and the in/out blocks add
#: ~240*SX more against the ~16 MB budget; the bridge falls back to the
#: XLA kernel above this instead of failing Mosaic compilation at runtime
MAX_SX = 3072


def _affine_scan_lanes(a, b, length):
    """u[i] = a[i] lse (u[i-1] + b[i]) along the lane axis, Hillis-Steele
    over affine segment pairs (same construction as pallas_pairforward)."""
    n_steps = max(1, int(np.ceil(np.log2(length))))
    axis = a.ndim - 1
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, axis)
    v, w = a, b
    d = 1
    for _ in range(n_steps):
        v_s = jnp.where(idx >= d, pltpu.roll(v, np.int32(d), axis=axis), F32_NEG)
        w_s = jnp.where(idx >= d, pltpu.roll(w, np.int32(d), axis=axis), np.float32(0.0))
        v = jnp.logaddexp(v, v_s + w)
        w = jnp.maximum(w + w_s, F32_NEG)
        d *= 2
    return v


def _column_step(
    j, i, absorb_col, mgate, nul_j, rdy_j, rsy_j, isy_j,
    y_src_ref, y_lp_ref, trans, xv, ring, ring_len, ky,
    imm_out, imd_out, idm_out, imi_out, iiw_out,
):
    """One DP column: y in-edge gather/reduce + the 5-state recurrence
    with two lane affine scans.  Shared by the plain kernel (absorb and
    mask streamed from HBM) and the fused kernel (both built in-register
    from O(L) factors)."""
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw,
     imd_imm, imd_imd, imd_idm,
     idm_imm, idm_imd, idm_idm,
     imi_imm, imi_imd, imi_imi, imi_iiw,
     iiw_imm, iiw_idm, iiw_iiw) = trans
    rsx, isx, x_gate, x_eos = xv
    SX = rsx.shape[1]
    KY = ky
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, SX), 1)

    def shift1(v):
        s = pltpu.roll(v, np.int32(1), axis=1)
        return jnp.where(lane >= 1, s, F32_NEG)

    # ---- gather + reduce over y in-edges (KY static, unrolled --
    # a fori_loop here acquires an i64 scan counter under x64, and
    # Mosaic's i64->i32 convert lowering recurses forever) ----------
    neg_acc = jnp.full((1, SX), F32_NEG)
    t5_acc = immn_acc = idm_acc = idmn_acc = imi_acc = imin_acc = neg_acc
    for k in range(KY):
        base = j * np.int32(KY) + np.int32(k)
        src = y_src_ref[base]
        w = y_lp_ref[base]
        slot = jax.lax.rem(src, np.int32(ring_len))
        col = ring[pl.ds(slot, 1)][0]  # [8, SX]
        s_imm, s_imd, s_idm, s_imi, s_iiw = (
            col[q : q + 1] for q in range(5)
        )  # [1, SX] each
        t5 = jnp.logaddexp(
            jnp.logaddexp(
                jnp.logaddexp(s_imm + imm_imm, s_imd + imd_imm),
                jnp.logaddexp(s_idm + idm_imm, s_imi + imi_imm),
            ),
            s_iiw + iiw_imm,
        )
        t5_acc = jnp.logaddexp(t5_acc, jnp.maximum(t5 + w, F32_NEG))
        immn_acc = jnp.logaddexp(immn_acc, jnp.maximum(s_imm + w, F32_NEG))
        kn_idm = jnp.logaddexp(
            jnp.logaddexp(s_imm + imm_idm, s_imd + imd_idm),
            jnp.logaddexp(s_idm + idm_idm, s_iiw + iiw_idm),
        )
        idm_acc = jnp.logaddexp(idm_acc, jnp.maximum(kn_idm + w, F32_NEG))
        idmn_acc = jnp.logaddexp(idmn_acc, jnp.maximum(s_idm + w, F32_NEG))
        kn_imi = jnp.logaddexp(s_imm + imm_imi, s_imi + imi_imi)
        imi_acc = jnp.logaddexp(imi_acc, jnp.maximum(kn_imi + w, F32_NEG))
        imin_acc = jnp.logaddexp(imin_acc, jnp.maximum(s_imi + w, F32_NEG))

    is_null = nul_j > np.float32(0.5)

    # ---- IMM ---------------------------------------------------------
    imm_e = shift1(t5_acc) + absorb_col
    imm_n = jnp.maximum(immn_acc + x_eos, F32_NEG)
    imm_col = jnp.where(is_null, imm_n, imm_e)
    start = jnp.where((j == 0) & (lane == 0), np.float32(0.0), F32_NEG)
    imm_col = jnp.maximum(imm_col, start)
    imm_col = jnp.maximum(imm_col + mgate, F32_NEG)

    # ---- IDM / IMI -----------------------------------------------------
    idm_e = jnp.maximum(idm_acc + rsy_j + x_gate, F32_NEG)
    idm_col = jnp.where(is_null, idmn_acc, idm_e)
    idm_col = jnp.maximum(idm_col + mgate, F32_NEG)
    imi_e = jnp.maximum(imi_acc + isy_j + x_gate, F32_NEG)
    imi_col = jnp.where(is_null, imin_acc, imi_e)
    imi_col = jnp.maximum(imi_col + mgate, F32_NEG)

    # ---- IMD / IIW (affine scans over the x lanes) --------------------
    ygate = jnp.where(rdy_j > np.float32(0.5), np.float32(0.0), F32_NEG)
    a_imd = shift1(
        jnp.logaddexp(
            jnp.logaddexp(imm_col + imm_imd, idm_col + idm_imd),
            imi_col + imi_imd,
        )
    )
    a_imd = jnp.maximum(a_imd + rsx + ygate + mgate, F32_NEG)
    b_imd = jnp.maximum(imd_imd + rsx + mgate, F32_NEG)
    imd_col = _affine_scan_lanes(a_imd, b_imd, SX)

    a_iiw = shift1(jnp.logaddexp(imm_col + imm_iiw, imi_col + imi_iiw))
    a_iiw = jnp.maximum(a_iiw + isx + ygate + mgate, F32_NEG)
    b_iiw = jnp.maximum(iiw_iiw + isx + mgate, F32_NEG)
    iiw_col = _affine_scan_lanes(a_iiw, b_iiw, SX)

    # ---- store: outputs + ring slot ------------------------------------
    imm_out[i : i + 1] = imm_col
    imd_out[i : i + 1] = imd_col
    idm_out[i : i + 1] = idm_col
    imi_out[i : i + 1] = imi_col
    iiw_out[i : i + 1] = iiw_col
    slot_j = jax.lax.rem(j, np.int32(ring_len))
    neg_row = jnp.full((1, SX), F32_NEG)
    packed = jnp.concatenate(
        [imm_col, imd_col, idm_col, imi_col, iiw_col,
         neg_row, neg_row, neg_row],
        axis=0,
    )
    ring[pl.ds(slot_j, 1)] = packed[None]


def _unpack_trans(trans_ref):
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, _imm_eee,
     imd_imm, imd_imd, imd_idm, _imd_eee,
     idm_imm, idm_imd, idm_idm, _idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, _imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, _iiw_eee) = (trans_ref[0, k] for k in range(23))
    return (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw,
            imd_imm, imd_imd, imd_idm,
            idm_imm, idm_imd, idm_idm,
            imi_imm, imi_imd, imi_imi, imi_iiw,
            iiw_imm, iiw_idm, iiw_iiw)


def _kernel(
    ky,  # static in-edge count (bound via functools.partial)
    ring_len,  # static ring length (pow2 >= max in-edge distance + 1)
    # scalar prefetch (SMEM; FLAT 1D -- 2D SMEM tables pad every row to
    # a full granule and blow the 1MB smem budget)
    y_src_ref,  # [SY * KY] i32
    y_lp_ref,  # [SY * KY] f32
    y_flags_ref,  # [SY * 4] f32: null, ready, rootsub_y, ins_y per column
    # streamed / resident tensor inputs (VMEM)
    absorb_ref,  # block [1, SX]
    maskg_ref,  # block [1, SX]  (0 in-envelope, NEG outside)
    xvec_ref,  # [4, SX]: rootsub_x, ins_x, x_gate (0/NEG), x_eos (0/NEG)
    trans_ref,  # [1, 23]
    # outputs (each block [1, SX])
    imm_out, imd_out, idm_out, imi_out, iiw_out,
    # scratch
    ring,  # [RING, 8, SX]
):
    trans = _unpack_trans(trans_ref)

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, F32_NEG, dtype=ring.dtype)

    xv = (xvec_ref[0:1], xvec_ref[1:2], xvec_ref[2:3], xvec_ref[3:4])

    for i in range(CPB):  # one DP column per unrolled step
        j = g * np.int32(CPB) + np.int32(i)
        mgate = maskg_ref[i : i + 1]  # [1, SX]
        absorb_col = absorb_ref[i : i + 1]
        j4 = j * np.int32(4)
        nul_j = y_flags_ref[j4]
        rdy_j = y_flags_ref[j4 + np.int32(1)]
        rsy_j = y_flags_ref[j4 + np.int32(2)]
        isy_j = y_flags_ref[j4 + np.int32(3)]
        _column_step(
            j, i, absorb_col, mgate, nul_j, rdy_j, rsy_j, isy_j,
            y_src_ref, y_lp_ref, trans, xv, ring, ring_len, ky,
            imm_out, imd_out, idm_out, imi_out, iiw_out,
        )


#: fused-emission gate: ey scalars ride SMEM ([SY * CA] f32 next to the
#: in-edge tables), so CA and SY are bounded by the ~1 MB SMEM budget
FUSED_MAX_CA = 32
FUSED_MAX_SMEM = 800_000  # bytes across all scalar-prefetch operands


def _kernel_fused(
    ky, ring_len,
    # scalar prefetch (SMEM, flat)
    y_src_ref,  # [SY * KY] i32
    y_lp_ref,  # [SY * KY] f32
    y_flags_ref,  # [SY * 8] f32: null, ready, rootsub_y, ins_y,
    #              m2 (band coord), y_near_end (0/1), shift_y, pad
    # streamed / resident tensor inputs (VMEM)
    ey_ref,  # block [CPB, CA_pad]: exp-shifted y emission factors
    ex_ref,  # [CA_pad, SX]: exp-shifted x emission factors, transposed
    xvec_ref,  # [8, SX]: rootsub_x, ins_x, x_gate, x_eos, shift_x,
    #           m1 (band coord), x_near_start (0/1), x_in_range (0/1)
    params_ref,  # [1, 32]: 23 transitions, [23] band max distance, [24] ny
    # outputs (each block [1, SX])
    imm_out, imd_out, idm_out, imi_out, iiw_out,
    # scratch
    ring,
):
    """The fused production kernel: identical DP recurrence to _kernel,
    but the match emission and the band mask are built IN-KERNEL from
    O(L) factors instead of streamed as [SY, SX] HBM planes --
    absorb[j, i] = log(sum_c ey[j, c] ex[c, i]) + shift_y[j] + shift_x[i]
    (the reference's computeLogProbAbsorb, forward.h:112-124) computed as
    ONE MXU matmul per CPB-column grid step, and
    mask[j, i] = near_end[j] | near_start[i] | |m2[j] - m1[i]| <= D
    (GuideAlignmentEnvelope.inRange, alignpath.h:56-61) as VPU compares.
    Saves two full plane materializations (HBM write + read) and one XLA
    dispatch per merge."""
    trans = _unpack_trans(params_ref)
    dist = params_ref[0, 23]
    ny_f = params_ref[0, 24]

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        ring[...] = jnp.full(ring.shape, F32_NEG, dtype=ring.dtype)

    xv = (xvec_ref[0:1], xvec_ref[1:2], xvec_ref[2:3], xvec_ref[3:4])
    shift_x = xvec_ref[4:5]
    m1 = xvec_ref[5:6]
    xns = xvec_ref[6:7]
    xrange_ok = xvec_ref[7:8] > np.float32(0.5)
    SX = shift_x.shape[1]

    # one MXU matmul builds this grid step's CPB emission columns
    emis = jnp.dot(ey_ref[...], ex_ref[...], preferred_element_type=jnp.float32)
    log_emis = jnp.maximum(jnp.log(emis), F32_NEG)  # [CPB, SX]

    for i in range(CPB):
        j = g * np.int32(CPB) + np.int32(i)
        j8 = j * np.int32(8)
        nul_j = y_flags_ref[j8]
        rdy_j = y_flags_ref[j8 + np.int32(1)]
        rsy_j = y_flags_ref[j8 + np.int32(2)]
        isy_j = y_flags_ref[j8 + np.int32(3)]
        m2_j = y_flags_ref[j8 + np.int32(4)]
        yne_j = y_flags_ref[j8 + np.int32(5)]
        sy_j = y_flags_ref[j8 + np.int32(6)]

        absorb_col = log_emis[i : i + 1] + sy_j + shift_x

        # band mask from the envelope's O(L) coordinate vectors, ANDed
        # with the real-region bounds so pads are always out-of-band
        row_live = jnp.float32(j) < ny_f
        in_band = (
            (jnp.abs(m1 - m2_j) <= dist)
            | (xns > np.float32(0.5))
            | (jnp.full((1, SX), yne_j) > np.float32(0.5))
        ) & xrange_ok & row_live
        mgate = jnp.where(in_band, np.float32(0.0), F32_NEG)

        _column_step(
            j, i, absorb_col, mgate, nul_j, rdy_j, rsy_j, isy_j,
            y_src_ref, y_lp_ref, trans, xv, ring, ring_len, ky,
            imm_out, imd_out, idm_out, imi_out, iiw_out,
        )


@functools.partial(jax.jit, static_argnames=("interpret", "ring"))
def pallas_col_forward_cells_fused(
    y_src, y_lp, y_flags,  # [SY, KY] i32 / [SY, KY] f32 / [SY, 8] f32
    ey,  # [SY, CA_pad] f32 exp-shifted y factors (CA padded to match ex_t)
    ex_t,  # [CA_pad, SX] f32 exp-shifted x factors (transposed)
    xvec,  # [8, SX] f32 (see _kernel_fused)
    params,  # [32] f32: 23 transitions, [23] band distance, [24] ny
    interpret: bool = False,
    ring: int = RING,
):
    """Fused-emission variant of pallas_col_forward_cells; returns the
    five state planes stacked [5, SY, SX] (f32)."""
    import sys

    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    SY, CA_pad = ey.shape
    assert ex_t.shape[0] == CA_pad, (ey.shape, ex_t.shape)
    SX = ex_t.shape[1]
    assert SY % CPB == 0, (SY, CPB)
    Z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(SY // CPB,),
        in_specs=[
            pl.BlockSpec((CPB, CA_pad), lambda g, *_: (g, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec(ex_t.shape, lambda g, *_: (Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, SX), lambda g, *_: (Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 32), lambda g, *_: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CPB, SX), lambda g, *_: (g, Z), memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        scratch_shapes=[pltpu.VMEM((ring, 8, SX), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel_fused, y_src.shape[1], ring),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((SY, SX), jnp.float32)] * 5,
        interpret=interpret,
    )(y_src.reshape(-1), y_lp.reshape(-1), y_flags.reshape(-1),
      ey, ex_t, xvec, params.reshape(1, 32))
    return jnp.stack(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "ring"))
def pallas_col_forward_cells(
    y_src, y_lp, y_flags,  # [SY, KY] i32 / [SY, KY] f32 / [SY, 4] f32
    absorb_t, maskg_t,  # [SY, SX] f32 (maskg: 0 in-band, NEG outside)
    xvec,  # [4, SX] f32: rootsub_x, ins_x, x_gate, x_eos (0/NEG gates)
    trans,  # [23] f32
    interpret: bool = False,
    ring: int = RING,
):
    """Returns the five state planes stacked [5, SY, SX] (f32)."""
    import sys

    # Mosaic lowers the CPB-unrolled body recursively; the default 1000
    # frame limit trips on it (pure lowering depth, not runtime state)
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)
    SY, SX = absorb_t.shape
    assert SY % CPB == 0, (SY, CPB)
    Z = np.int32(0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(SY // CPB,),
        in_specs=[
            pl.BlockSpec((CPB, SX), lambda g, *_: (g, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((CPB, SX), lambda g, *_: (g, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, SX), lambda g, *_: (Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 23), lambda g, *_: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((CPB, SX), lambda g, *_: (g, Z), memory_space=pltpu.VMEM)
            for _ in range(5)
        ],
        scratch_shapes=[pltpu.VMEM((ring, 8, SX), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, y_src.shape[1], ring),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((SY, SX), jnp.float32)] * 5,
        interpret=interpret,
    )(y_src.reshape(-1), y_lp.reshape(-1), y_flags.reshape(-1),
      absorb_t, maskg_t, xvec, trans.reshape(1, 23))
    return jnp.stack(outs, axis=0)
