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
