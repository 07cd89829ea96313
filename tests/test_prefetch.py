"""Device-program prefetch warm path (recon._prefetch_device_programs)."""

import threading

import numpy as np
import pytest

import historian_tpu.recon as recon_mod
from historian_tpu.core.seqs import FastSeq
from historian_tpu.models.ratemodel import RateModel


class _DS:
    def __init__(self, seqs):
        self.seqs = seqs


@pytest.fixture
def force_device(monkeypatch):
    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "1")
    monkeypatch.setenv("HISTORIAN_DEVICE_TRACE", "1")
    monkeypatch.setattr(recon_mod, "PREFETCH_MIN_CELLS", 1.0)
    recon_mod._PREFETCHED_BUCKETS.clear()
    yield
    recon_mod._PREFETCHED_BUCKETS.clear()


def test_prefetch_runs_real_route_and_dedupes(ref_data, force_device):
    model = RateModel.from_file(f"{ref_data}/testamino.json")
    rng = np.random.RandomState(1)
    alpha = model.alphabet.symbols
    seqs = [
        FastSeq(name=f"s{i}", seq="".join(alpha[j] for j in rng.randint(0, 20, size=90)))
        for i in range(3)
    ]
    r = recon_mod.Reconstructor()
    before = set(threading.enumerate())
    r._prefetch_device_programs(_DS(seqs), model)
    new = [t for t in threading.enumerate() if t not in before]
    assert len(new) == 1, "prefetch should spawn exactly one warm thread"
    new[0].join(timeout=120)
    assert not new[0].is_alive(), "warm thread did not finish"
    assert len(recon_mod._PREFETCHED_BUCKETS) == 1

    # second call with the same bucket shapes is a no-op
    before = set(threading.enumerate())
    r._prefetch_device_programs(_DS(seqs), model)
    assert [t for t in threading.enumerate() if t not in before] == []


def test_prefetch_skips_small_inputs(ref_data, monkeypatch):
    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "1")
    recon_mod._PREFETCHED_BUCKETS.clear()
    model = RateModel.from_file(f"{ref_data}/testamino.json")
    r = recon_mod.Reconstructor()
    before = set(threading.enumerate())
    r._prefetch_device_programs(_DS([FastSeq(name="a", seq="ACDEF")]), model)
    assert [t for t in threading.enumerate() if t not in before] == []
    assert not recon_mod._PREFETCHED_BUCKETS
