"""Pallas pair-forward kernel vs the scan kernel (interpret mode on CPU)."""

import functools

import numpy as np
import pytest
from jax.experimental import pallas as pl

from historian_tpu.core.seqs import read_fasta
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward


@pytest.fixture
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def test_pallas_matches_scan(ref_data, interpret_pallas):
    from historian_tpu.ops.pallas_pairforward import pallas_pair_forward_lp

    model = RateModel.from_file(f"{ref_data}/testamino.json")
    seqs = read_fasta(f"{ref_data}/PF16593.pair.fa")
    args, _ = chain_pair_forward_arrays(model, seqs[0].seq, seqs[1].seq, 1.0, 0.5, dtype=np.float32)
    absorb, rsx, rsy, ix, iy, mask, trans = args
    _, lp_scan = pair_forward(*args)
    lp_pallas = pallas_pair_forward_lp(
        absorb[None], rsx[None], rsy[None], ix[None], iy[None], trans
    )
    assert abs(float(lp_scan) - float(lp_pallas[0])) < 1e-3


def test_pallas_tiled_matches_scan(ref_data, interpret_pallas):
    from historian_tpu.ops.pallas_pairforward import pallas_pair_forward_lp_tiled

    model = RateModel.from_file(f"{ref_data}/testamino.json")
    seqs = read_fasta(f"{ref_data}/PF16593.pair.fa")
    args, _ = chain_pair_forward_arrays(model, seqs[0].seq, seqs[1].seq, 1.0, 0.5, dtype=np.float32)
    absorb, rsx, rsy, ix, iy, mask, trans = args
    _, lp_scan = pair_forward(*args)
    # x_tile smaller than X+1 forces multiple tiles + row padding
    lp = pallas_pair_forward_lp_tiled(
        absorb[None], rsx[None], rsy[None], ix[None], iy[None], trans, x_tile=16
    )
    assert abs(float(lp_scan) - float(lp[0])) < 1e-3


def test_pallas_tiled_single_partial_tile(ref_data, interpret_pallas):
    """X+1 smaller than one tile: padding rows run after lp capture."""
    from historian_tpu.ops.pallas_pairforward import pallas_pair_forward_lp_tiled

    model = RateModel.from_file(f"{ref_data}/testamino.json")
    seqs = read_fasta(f"{ref_data}/PF16593.pair.fa")
    args, _ = chain_pair_forward_arrays(model, seqs[0].seq[:9], seqs[1].seq[:23], 0.6, 0.4, dtype=np.float32)
    absorb, rsx, rsy, ix, iy, mask, trans = args
    _, lp_scan = pair_forward(*args)
    lp = pallas_pair_forward_lp_tiled(
        absorb[None], rsx[None], rsy[None], ix[None], iy[None], trans, x_tile=64
    )
    assert abs(float(lp_scan) - float(lp[0])) < 1e-3


@pytest.mark.slow
def test_pallas_col_forward_matches_xla_kernel(ref_data, interpret_pallas):
    """Pallas column-major kernel (interpret mode) vs the XLA column
    kernel on a synthetic chain-x x DAG-y pair with nulls, forks, and a
    banded envelope."""
    import jax.numpy as jnp

    from historian_tpu.ops.colforward import col_pair_forward_cells
    from historian_tpu.ops.pallas_colforward import pallas_col_forward_cells

    SX, SY, KY = 128, 256, 4
    rng = np.random.default_rng(17)
    dt = np.float32
    absorb_t = rng.normal(-5, 1, (SY, SX)).astype(dt)
    rsx = rng.normal(-2, 1, SX).astype(dt)
    isx = rng.normal(-2, 1, SX).astype(dt)
    rsy = rng.normal(-2, 1, SY).astype(dt)
    isy = rng.normal(-2, 1, SY).astype(dt)
    mask = np.zeros((SY, SX), bool)
    for j in range(SY):  # diagonal band
        lo = max(0, j * SX // SY - 24)
        hi = min(SX, j * SX // SY + 24)
        mask[j, lo:hi] = True
    trans = rng.normal(-1, 0.5, 23).astype(dt)
    x_ready = np.ones(SX, bool); x_ready[-1] = False
    x_eos = np.ones(SX, bool)
    y_src = np.clip(
        np.arange(SY)[:, None] - 1 - rng.integers(0, 6, (SY, KY)), 0, None
    ).astype(np.int32)
    y_src[:, 0] = np.maximum(np.arange(SY) - 1, 0)
    y_lp = rng.normal(-1, 0.5, (SY, KY)).astype(dt)
    y_lp[:, 2:] = np.float32(-1e30)
    y_null = np.zeros(SY, bool)
    y_null[rng.choice(np.arange(1, SY), 12, replace=False)] = True
    y_ready = np.ones(SY, bool); y_ready[0] = False

    ref_cells = np.asarray(col_pair_forward_cells(
        jnp.asarray(absorb_t), jnp.asarray(rsx), jnp.asarray(isx),
        jnp.asarray(rsy), jnp.asarray(isy), jnp.asarray(mask),
        jnp.asarray(trans), jnp.asarray(x_ready), jnp.asarray(x_eos),
        jnp.asarray(y_src), jnp.asarray(y_lp),
        jnp.asarray(y_null), jnp.asarray(y_ready),
    ))  # [SY, SX, 5]

    y_flags = np.zeros((SY, 4), np.float32)
    y_flags[:, 0] = y_null; y_flags[:, 1] = y_ready
    y_flags[:, 2] = rsy; y_flags[:, 3] = isy
    xvec = np.stack([rsx, isx,
                     np.where(x_ready, 0.0, -1e30).astype(dt),
                     np.where(x_eos, 0.0, -1e30).astype(dt)])
    maskg = np.where(mask, 0.0, -1e30).astype(dt)
    planes = np.asarray(pallas_col_forward_cells(
        jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
        jnp.asarray(absorb_t), jnp.asarray(maskg), jnp.asarray(xvec),
        jnp.asarray(trans), interpret=True,
    ))  # [5, SY, SX]
    got = np.moveaxis(planes, 0, -1)  # [SY, SX, 5]

    live = ref_cells > -1e25
    assert np.all((got > -1e25) == live)
    np.testing.assert_allclose(got[live], ref_cells[live], rtol=2e-5, atol=1e-3)


def test_pallas_col_small_ring_matches_xla(interpret_pallas):
    """ring=8 (the chain-y / long-sequence configuration, in-edge
    distance <= 7) must match the XLA kernel exactly like the default
    128-ring -- the ring length only changes the VMEM slot mapping."""
    import jax.numpy as jnp

    from historian_tpu.ops.colforward import col_pair_forward_cells
    from historian_tpu.ops.pallas_colforward import pallas_col_forward_cells

    SX, SY = 256, 128
    rng = np.random.default_rng(23)
    dt = np.float32
    absorb_t = rng.normal(-5, 1, (SY, SX)).astype(dt)
    rsx = rng.normal(-2, 1, SX).astype(dt)
    isx = rng.normal(-2, 1, SX).astype(dt)
    rsy = rng.normal(-2, 1, SY).astype(dt)
    isy = rng.normal(-2, 1, SY).astype(dt)
    mask = np.ones((SY, SX), bool)
    trans = rng.normal(-1, 0.5, 23).astype(dt)
    x_ready = np.ones(SX, bool)
    x_eos = np.ones(SX, bool)
    KY = 2
    # in-edge distances 1..7: all fit an 8-slot ring
    y_src = np.clip(
        np.arange(SY)[:, None] - 1 - rng.integers(0, 7, (SY, KY)), 0, None
    ).astype(np.int32)
    y_src[:, 0] = np.maximum(np.arange(SY) - 1, 0)
    y_lp = rng.normal(-1, 0.5, (SY, KY)).astype(dt)
    y_null = np.zeros(SY, bool)
    y_ready = np.ones(SY, bool); y_ready[0] = False

    ref_cells = np.asarray(col_pair_forward_cells(
        jnp.asarray(absorb_t), jnp.asarray(rsx), jnp.asarray(isx),
        jnp.asarray(rsy), jnp.asarray(isy), jnp.asarray(mask),
        jnp.asarray(trans), jnp.asarray(x_ready), jnp.asarray(x_eos),
        jnp.asarray(y_src), jnp.asarray(y_lp),
        jnp.asarray(y_null), jnp.asarray(y_ready),
    ))
    y_flags = np.zeros((SY, 4), np.float32)
    y_flags[:, 0] = y_null; y_flags[:, 1] = y_ready
    y_flags[:, 2] = rsy; y_flags[:, 3] = isy
    xvec = np.stack([rsx, isx,
                     np.where(x_ready, 0.0, -1e30).astype(dt),
                     np.where(x_eos, 0.0, -1e30).astype(dt)])
    maskg = np.where(mask, 0.0, -1e30).astype(dt)
    planes = np.asarray(pallas_col_forward_cells(
        jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
        jnp.asarray(absorb_t), jnp.asarray(maskg), jnp.asarray(xvec),
        jnp.asarray(trans), interpret=True, ring=8,
    ))
    got = np.moveaxis(planes, 0, -1)
    live = ref_cells > -1e25
    assert np.all((got > -1e25) == live)
    np.testing.assert_allclose(got[live], ref_cells[live], rtol=2e-5, atol=1e-3)


def test_pallas_col_fused_matches_xla(interpret_pallas):
    """The fused kernel (emission matmul + band mask built in-kernel from
    O(L) factors) must match the XLA column kernel fed the equivalent
    dense absorb/mask planes."""
    import jax.numpy as jnp

    from historian_tpu.ops.colforward import col_pair_forward_cells
    from historian_tpu.ops.pallas_colforward import pallas_col_forward_cells_fused

    SX, SY, KY, CA = 128, 256, 4, 20
    nx, ny = 101, 233  # real region strictly inside the padded grid
    rng = np.random.default_rng(31)
    dt = np.float32

    # exp-shifted emission factors + shifts (what absorb_factors carries)
    ex_f = rng.uniform(0.05, 1.0, (SX, CA)).astype(dt); ex_f[nx:] = 0
    ey_f = rng.uniform(0.05, 1.0, (SY, CA)).astype(dt); ey_f[ny:] = 0
    shift_x = rng.normal(-1, 0.5, SX).astype(dt); shift_x[nx:] = np.float32(-1e30)
    shift_y = rng.normal(-1, 0.5, SY).astype(dt); shift_y[ny:] = 0

    # band vectors (cumulative-match coordinates)
    m1 = np.full(SX, 1 << 29, np.int32)
    m1[:nx] = np.sort(rng.integers(0, 60, nx))
    m2 = np.full(SY, -(1 << 29), np.int32)
    m2[:ny] = np.sort(rng.integers(0, 60, ny))
    dist = 7
    xns = np.zeros(SX, bool); xns[:3] = True
    yne = np.zeros(SY, bool); yne[ny - 2 : ny] = True

    # dense equivalents for the XLA reference
    with np.errstate(divide="ignore"):
        dense = np.log(ey_f @ ex_f.T) + shift_y[:, None] + shift_x[None, :]
    in_range = (np.arange(SY) < ny)[:, None] & (np.arange(SX) < nx)[None, :]
    mask = in_range & (
        yne[:, None] | xns[None, :]
        | (np.abs(m2[:, None].astype(np.int64) - m1[None, :]) <= dist)
    )
    absorb_t = np.where(mask, np.maximum(dense, -1e30), -1e30).astype(dt)

    rsx = rng.normal(-2, 1, SX).astype(dt)
    isx = rng.normal(-2, 1, SX).astype(dt)
    rsy = rng.normal(-2, 1, SY).astype(dt)
    isy = rng.normal(-2, 1, SY).astype(dt)
    trans = rng.normal(-1, 0.5, 23).astype(dt)
    x_ready = np.ones(SX, bool); x_ready[-1] = False
    x_eos = np.ones(SX, bool)
    y_src = np.clip(
        np.arange(SY)[:, None] - 1 - rng.integers(0, 6, (SY, KY)), 0, None
    ).astype(np.int32)
    y_src[:, 0] = np.maximum(np.arange(SY) - 1, 0)
    y_lp = rng.normal(-1, 0.5, (SY, KY)).astype(dt)
    y_lp[:, 2:] = np.float32(-1e30)
    y_null = np.zeros(SY, bool)
    y_null[rng.choice(np.arange(1, ny), 12, replace=False)] = True
    y_ready = np.ones(SY, bool); y_ready[0] = False

    ref_cells = np.asarray(col_pair_forward_cells(
        jnp.asarray(absorb_t), jnp.asarray(rsx), jnp.asarray(isx),
        jnp.asarray(rsy), jnp.asarray(isy), jnp.asarray(mask),
        jnp.asarray(trans), jnp.asarray(x_ready), jnp.asarray(x_eos),
        jnp.asarray(y_src), jnp.asarray(y_lp),
        jnp.asarray(y_null), jnp.asarray(y_ready),
    ))

    y_flags = np.zeros((SY, 8), np.float32)
    y_flags[:, 0] = y_null; y_flags[:, 1] = y_ready
    y_flags[:, 2] = rsy; y_flags[:, 3] = isy
    y_flags[:, 4] = m2; y_flags[:, 5] = yne; y_flags[:, 6] = shift_y
    xvec = np.zeros((8, SX), np.float32)
    xvec[0] = rsx; xvec[1] = isx
    xvec[2] = np.where(x_ready, 0.0, -1e30)
    xvec[3] = np.where(x_eos, 0.0, -1e30)
    xvec[4] = shift_x; xvec[5] = m1; xvec[6] = xns
    xvec[7, :nx] = 1.0
    ca_pad = -(-CA // 8) * 8
    ex_t = np.zeros((ca_pad, SX), np.float32)
    ex_t[:CA] = ex_f.T
    ey_p = np.zeros((SY, ca_pad), np.float32)
    ey_p[:, :CA] = ey_f
    params = np.zeros(32, np.float32)
    params[:23] = trans; params[23] = dist; params[24] = ny

    planes = np.asarray(pallas_col_forward_cells_fused(
        jnp.asarray(y_src), jnp.asarray(y_lp), jnp.asarray(y_flags),
        jnp.asarray(ey_p), jnp.asarray(ex_t), jnp.asarray(xvec),
        jnp.asarray(params), interpret=True,
    ))
    got = np.moveaxis(planes, 0, -1)
    live = ref_cells > -1e25
    assert np.all((got > -1e25) == live)
    np.testing.assert_allclose(got[live], ref_cells[live], rtol=2e-5, atol=1e-3)
