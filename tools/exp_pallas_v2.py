"""Experiment: optimized variants of the Pallas pair-forward kernel.

v2 changes vs historian_tpu/ops/pallas_pairforward.py:
  1. per-row emission scalars (rsx_i, ix_i) come from a [1, X1, G, 2]
     side input indexed on the untiled leading dim (like absorb), not an
     O(X1) one-hot reduction per row (O(X1^2) total);
  2. the 3/4/5-way logaddexp trees become one max + exps + single log;
  3. the IDM and IMI affine row scans are fused into one [2G, Y1] scan.

Run CPU validation:  JAX_PLATFORMS=cpu python tools/exp_pallas_v2.py check
Run TPU A/B:         python tools/exp_pallas_v2.py bench
"""

from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from historian_tpu.ops.pallas_pairforward import (  # noqa: E402
    F32_NEG,
    F32_ZERO,
    NEG,
    _affine_scan_row,
)

GROUP = 8


def _lse(*xs):
    m = xs[0]
    for x in xs[1:]:
        m = jnp.maximum(m, x)
    m = jnp.maximum(m, F32_NEG)
    s = jnp.exp(xs[0] - m)
    for x in xs[1:]:
        s = s + jnp.exp(x - m)
    return m + jnp.log(s)


def _kernel_v2(absorb_ref, scal_ref, rsy_ref, iy_ref, trans_ref, out_ref):
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (trans_ref[0, k] for k in range(23))

    X1 = absorb_ref.shape[1]
    G = absorb_ref.shape[2]
    Y1 = absorb_ref.shape[3]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Y1), 1)
    neg_row = jnp.full((G, Y1), F32_NEG, dtype=absorb_ref.dtype)
    rsy = rsy_ref[0]
    iy = iy_ref[0]
    y_ready = col_idx < Y1 - 1
    b_fused = jnp.concatenate([idm_idm + rsy, imi_imi + iy], axis=0)

    def shift1(v):
        s = pltpu.roll(v, np.int32(1), axis=1)
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.where(idx >= 1, s, F32_NEG)

    start_row = jnp.where(col_idx == 0, F32_ZERO, neg_row)
    imm0 = start_row
    a0 = jnp.concatenate(
        [shift1(imm0 + imm_idm) + rsy, shift1(imm0 + imm_imi) + iy], axis=0
    )
    u0 = _affine_scan_row(a0, b_fused, Y1)
    idm0, imi0 = u0[:G], u0[G:]

    def body(i, carry):
        imm_p, imd_p, idm_p, imi_p, iiw_p = carry
        sc = scal_ref[0, i]  # [G, 2]: lane 0 = rsx_i, lane 1 = ix_i
        rsx_i = jnp.maximum(sc[:, 0:1], F32_NEG)
        ix_i = jnp.maximum(sc[:, 1:2], F32_NEG)

        imd = _lse(imm_p + imm_imd, imd_p + imd_imd,
                   idm_p + idm_imd, imi_p + imi_imd) + rsx_i
        iiw = _lse(imm_p + imm_iiw, imi_p + imi_iiw, iiw_p + iiw_iiw) + ix_i
        imd = jnp.where(y_ready, imd, F32_NEG)
        iiw = jnp.where(y_ready, iiw, F32_NEG)

        imm_src = _lse(imm_p + imm_imm, imd_p + imd_imm, idm_p + idm_imm,
                       imi_p + imi_imm, iiw_p + iiw_imm)
        imm = shift1(imm_src) + absorb_ref[0, i]

        idm_other = _lse(imm + imm_idm, imd + imd_idm, iiw + iiw_idm)
        a = jnp.concatenate(
            [shift1(idm_other) + rsy, shift1(imm + imm_imi) + iy], axis=0
        )
        u = _affine_scan_row(a, b_fused, Y1)
        return imm, imd, u[:G], u[G:], iiw

    init = (imm0, neg_row, idm0, imi0, neg_row)
    imm, imd, idm, imi, iiw = jax.lax.fori_loop(1, X1, body, init)

    lp_end = _lse(
        imm[:, Y1 - 1:Y1] + imm_eee,
        imd[:, Y1 - 1:Y1] + imd_eee,
        iiw[:, Y1 - 1:Y1] + iiw_eee,
    )
    out_ref[0] = lp_end


@jax.jit
def pallas_pair_forward_lp_v2(absorb, rsx, rsy, ix, iy, trans):
    B = absorb.shape[0]
    x1, y1 = absorb.shape[1], absorb.shape[2]
    G = GROUP
    NG = (B + G - 1) // G
    pad = NG * G - B
    if pad:
        absorb = jnp.concatenate([absorb, jnp.broadcast_to(absorb[:1], (pad, x1, y1))])
        rsx = jnp.concatenate([rsx, jnp.broadcast_to(rsx[:1], (pad, x1))])
        rsy = jnp.concatenate([rsy, jnp.broadcast_to(rsy[:1], (pad, y1))])
        ix = jnp.concatenate([ix, jnp.broadcast_to(ix[:1], (pad, x1))])
        iy = jnp.concatenate([iy, jnp.broadcast_to(iy[:1], (pad, y1))])
    absorb_t = absorb.reshape(NG, G, x1, y1).transpose(0, 2, 1, 3)
    # [NG, X1, G, 2] row-scalar sideband
    scal = jnp.stack([rsx, ix], axis=-1).reshape(NG, G, x1, 2).transpose(0, 2, 1, 3)
    Z = np.int32(0)
    out = pl.pallas_call(
        _kernel_v2,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, x1, G, y1), lambda b: (b, Z, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x1, G, 2), lambda b: (b, Z, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 23), lambda b: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, G, 1), absorb.dtype),
    )(
        absorb_t,
        scal,
        rsy.reshape(NG, G, y1),
        iy.reshape(NG, G, y1),
        trans.reshape(1, 23),
    )
    return out.reshape(NG * G)[:B]


def _kernel_v3(absorb_ref, rsx_ref, ix_ref, rsy_ref, iy_ref, trans_ref, out_ref):
    """Like v2 but the per-row scalars come from carried rolled copies of
    the [G, X1] rows (static lane-0 slice per row), no sideband memory."""
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (trans_ref[0, k] for k in range(23))

    X1 = absorb_ref.shape[1]
    G = absorb_ref.shape[2]
    Y1 = absorb_ref.shape[3]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (G, Y1), 1)
    neg_row = jnp.full((G, Y1), F32_NEG, dtype=absorb_ref.dtype)
    rsy = rsy_ref[0]
    iy = iy_ref[0]
    y_ready = col_idx < Y1 - 1
    b_fused = jnp.concatenate([idm_idm + rsy, imi_imi + iy], axis=0)
    # stacked [2G, X1]; rolled left once per row so lane 0 is row i
    rxix0 = jnp.concatenate([rsx_ref[0], ix_ref[0]], axis=0)
    roll_left = np.int32(X1 - 1)

    def shift1(v):
        s = pltpu.roll(v, np.int32(1), axis=1)
        idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        return jnp.where(idx >= 1, s, F32_NEG)

    start_row = jnp.where(col_idx == 0, F32_ZERO, neg_row)
    imm0 = start_row
    a0 = jnp.concatenate(
        [shift1(imm0 + imm_idm) + rsy, shift1(imm0 + imm_imi) + iy], axis=0
    )
    u0 = _affine_scan_row(a0, b_fused, Y1)
    idm0, imi0 = u0[:G], u0[G:]

    def body(i, carry):
        imm_p, imd_p, idm_p, imi_p, iiw_p, rxix = carry
        rxix = pltpu.roll(rxix, roll_left, axis=1)
        sc = jnp.maximum(rxix[:, 0:1], F32_NEG)  # [2G, 1]
        rsx_i = sc[:G]
        ix_i = sc[G:]

        imd = _lse(imm_p + imm_imd, imd_p + imd_imd,
                   idm_p + idm_imd, imi_p + imi_imd) + rsx_i
        iiw = _lse(imm_p + imm_iiw, imi_p + imi_iiw, iiw_p + iiw_iiw) + ix_i
        imd = jnp.where(y_ready, imd, F32_NEG)
        iiw = jnp.where(y_ready, iiw, F32_NEG)

        imm_src = _lse(imm_p + imm_imm, imd_p + imd_imm, idm_p + idm_imm,
                       imi_p + imi_imm, iiw_p + iiw_imm)
        imm = shift1(imm_src) + absorb_ref[0, i]

        idm_other = _lse(imm + imm_idm, imd + imd_idm, iiw + iiw_idm)
        a = jnp.concatenate(
            [shift1(idm_other) + rsy, shift1(imm + imm_imi) + iy], axis=0
        )
        u = _affine_scan_row(a, b_fused, Y1)
        return imm, imd, u[:G], u[G:], iiw, rxix

    init = (imm0, neg_row, idm0, imi0, neg_row, rxix0)
    imm, imd, idm, imi, iiw, _ = jax.lax.fori_loop(1, X1, body, init)

    lp_end = _lse(
        imm[:, Y1 - 1:Y1] + imm_eee,
        imd[:, Y1 - 1:Y1] + imd_eee,
        iiw[:, Y1 - 1:Y1] + iiw_eee,
    )
    out_ref[0] = lp_end


@jax.jit
def pallas_pair_forward_lp_v3(absorb, rsx, rsy, ix, iy, trans):
    B = absorb.shape[0]
    x1, y1 = absorb.shape[1], absorb.shape[2]
    G = GROUP
    NG = (B + G - 1) // G
    pad = NG * G - B
    if pad:
        absorb = jnp.concatenate([absorb, jnp.broadcast_to(absorb[:1], (pad, x1, y1))])
        rsx = jnp.concatenate([rsx, jnp.broadcast_to(rsx[:1], (pad, x1))])
        rsy = jnp.concatenate([rsy, jnp.broadcast_to(rsy[:1], (pad, y1))])
        ix = jnp.concatenate([ix, jnp.broadcast_to(ix[:1], (pad, x1))])
        iy = jnp.concatenate([iy, jnp.broadcast_to(iy[:1], (pad, y1))])
    absorb_t = absorb.reshape(NG, G, x1, y1).transpose(0, 2, 1, 3)
    Z = np.int32(0)
    out = pl.pallas_call(
        _kernel_v3,
        grid=(NG,),
        in_specs=[
            pl.BlockSpec((1, x1, G, y1), lambda b: (b, Z, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, x1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, x1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, y1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 23), lambda b: (Z, Z), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 1), lambda b: (b, Z, Z), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NG, G, 1), absorb.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
    )(
        absorb_t,
        rsx.reshape(NG, G, x1),
        ix.reshape(NG, G, x1),
        rsy.reshape(NG, G, y1),
        iy.reshape(NG, G, y1),
        trans.reshape(1, 23),
    )
    return out.reshape(NG * G)[:B]


def _inputs(batch, x_len, y_len, seed_pairs=8):
    from historian_tpu.models.presets import named_model
    from historian_tpu.ops.pairforward import chain_pair_forward_arrays

    model = named_model("lg")
    rng = np.random.RandomState(42)
    alpha = model.alphabet.symbols

    def random_seq(n):
        return "".join(alpha[i] for i in rng.randint(0, 20, size=n))

    pairs = []
    for _ in range(seed_pairs):
        a, _ = chain_pair_forward_arrays(
            model, random_seq(x_len), random_seq(y_len), 0.5, 0.5, dtype=np.float32
        )
        pairs.append(a)
    tile = batch // seed_pairs
    absorb = jnp.tile(jnp.stack([a[0] for a in pairs]), (tile, 1, 1))
    rsx = jnp.tile(jnp.stack([a[1] for a in pairs]), (tile, 1))
    rsy = jnp.tile(jnp.stack([a[2] for a in pairs]), (tile, 1))
    ix = jnp.tile(jnp.stack([a[3] for a in pairs]), (tile, 1))
    iy = jnp.tile(jnp.stack([a[4] for a in pairs]), (tile, 1))
    return absorb, rsx, rsy, ix, iy, pairs[0][5], pairs[0][6]


def check():
    import historian_tpu.ops.pallas_pairforward  # noqa: F401
    global pl
    orig = pl.pallas_call
    pl.pallas_call = functools.partial(orig, interpret=True)
    from historian_tpu.core.seqs import read_fasta
    from historian_tpu.models.ratemodel import RateModel
    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward

    model = RateModel.from_file("/root/reference/data/testamino.json")
    seqs = read_fasta("/root/reference/data/PF16593.pair.fa")
    args, _ = chain_pair_forward_arrays(
        model, seqs[0].seq, seqs[1].seq, 1.0, 0.5, dtype=np.float32
    )
    absorb, rsx, rsy, ix, iy, mask, trans = args
    _, lp_scan = pair_forward(*args)
    lp_v2 = pallas_pair_forward_lp_v2(
        absorb[None], rsx[None], rsy[None], ix[None], iy[None], trans
    )
    d = abs(float(lp_scan) - float(lp_v2[0]))
    print("lp_scan", float(lp_scan), "lp_v2", float(lp_v2[0]), "delta", d)
    assert d < 1e-3
    lp_v3 = pallas_pair_forward_lp_v3(
        absorb[None], rsx[None], rsy[None], ix[None], iy[None], trans
    )
    d3 = abs(float(lp_scan) - float(lp_v3[0]))
    print("lp_v3", float(lp_v3[0]), "delta", d3)
    assert d3 < 1e-3
    print("OK")


def bench():
    import historian_tpu.ops.pallas_pairforward as pp

    BATCH, X_LEN, Y_LEN, REPS = 128, 384, 384, 24
    absorb, rsx, rsy, ix, iy, mask, trans = _inputs(BATCH, X_LEN, Y_LEN)

    def measure(kernel, reps=REPS):
        @jax.jit
        def step(eps):
            return jnp.sum(kernel(absorb + eps, rsx, rsy, ix, iy))

        warm = float(step(jnp.float32(0.0)))
        assert np.isfinite(warm), warm
        t0 = time.perf_counter()
        accs = [step(jnp.float32(1e-4 * (k + 1))) for k in range(reps)]
        total = float(jnp.sum(jnp.stack(accs)))
        t1 = time.perf_counter()
        assert np.isfinite(total)
        cells = BATCH * (X_LEN + 1) * (Y_LEN + 1) * 5 * reps
        return cells / (t1 - t0)

    def v1(a, rx, ry, jx, jy):
        return pp.pallas_pair_forward_lp(a, rx, ry, jx, jy, trans)

    def v2(a, rx, ry, jx, jy):
        return pallas_pair_forward_lp_v2(a, rx, ry, jx, jy, trans)

    # throwaway warm pass (first in-process measurement understates ~40%)
    pp.GROUP = 32
    pp.pallas_pair_forward_lp.clear_cache()
    try:
        measure(v1)
    except Exception as e:
        print("warm v1 failed:", e)

    def v3(a, rx, ry, jx, jy):
        return pallas_pair_forward_lp_v3(a, rx, ry, jx, jy, trans)

    global GROUP
    for g in (32, 64, 128):
        pp.GROUP = g
        pp.pallas_pair_forward_lp.clear_cache()
        try:
            r1 = measure(v1)
        except Exception as e:
            r1 = float("nan")
            print(f"v1 G={g} failed: {type(e).__name__}")
        GROUP = g
        pallas_pair_forward_lp_v3.clear_cache()
        try:
            r3 = measure(v3)
        except Exception as e:
            r3 = float("nan")
            print(f"v3 G={g} failed: {type(e).__name__}")
        print(f"G={g:3d}  v1={r1:.3e}  v3={r3:.3e}  speedup={r3/r1:.3f}")


if __name__ == "__main__":
    if sys.argv[1:] == ["check"]:
        check()
    else:
        bench()
