"""Device-resident guide alignment (ops/guidedp) must reproduce the
host route exactly on CPU f64: same end cell, same score bits, same
traceback path (the kernel replicates the host candidate order and
first-max tie-breaking)."""

import os

import numpy as np
import pytest

from historian_tpu.core.seqs import read_fasta
from historian_tpu.engine.diagenv import DiagEnvParams, DiagonalEnvelope
from historian_tpu.engine.quickalign import QuickAligner
from historian_tpu.models.ratemodel import RateModel


def _jobs(ref_data, sparse: bool):
    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "gp120.fa"))[:6]
    jobs = []
    for a in range(len(seqs)):
        for b in range(a + 1, len(seqs)):
            x, y = seqs[a], seqs[b]
            env = DiagonalEnvelope(len(x.seq), len(y.seq))
            if sparse:
                env.init_sparse(
                    model.alphabet.tokenize(x.seq),
                    model.alphabet.tokenize(y.seq),
                    model.alphabet_size,
                    DiagEnvParams(),
                )
            else:
                env.init_full()
            jobs.append((x, y, env))
    return model, jobs


@pytest.mark.slow
@pytest.mark.parametrize("sparse", [False, True], ids=["full", "sparse"])
def test_device_guide_matches_host(ref_data, monkeypatch, sparse):
    model, jobs = _jobs(ref_data, sparse)
    aligner = QuickAligner(model, 1.0)

    monkeypatch.setenv("HISTORIAN_DEVICE_GUIDE", "0")
    host = aligner.align_batch(jobs)
    monkeypatch.setenv("HISTORIAN_DEVICE_GUIDE", "1")
    dev = aligner.align_batch(jobs)

    for k, (h, d) in enumerate(zip(host, dev)):
        assert d.end == h.end, (k, d.end, h.end)
        assert (d.x_end, d.y_end) == (h.x_end, h.y_end), k
        hp = h.align_path(0, 1)
        dp = d.align_path(0, 1)
        assert set(hp) == set(dp)
        for row in hp:
            np.testing.assert_array_equal(np.asarray(dp[row]), np.asarray(hp[row]))


def test_device_guide_trivial_and_short(ref_data, monkeypatch):
    """Zero-length and very short sequences go through unchanged."""
    from historian_tpu.core.seqs import FastSeq

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    aligner = QuickAligner(model, 0.5)
    jobs = []
    for xs, ys in [("", "ACDEF"), ("ACD", ""), ("A", "A"), ("ACDEFG", "ACDEG")]:
        x, y = FastSeq(name="x", seq=xs), FastSeq(name="y", seq=ys)
        env = DiagonalEnvelope(len(xs), len(ys)).init_full()
        jobs.append((x, y, env))
    monkeypatch.setenv("HISTORIAN_DEVICE_GUIDE", "0")
    host = aligner.align_batch(jobs)
    monkeypatch.setenv("HISTORIAN_DEVICE_GUIDE", "1")
    dev = aligner.align_batch(jobs)
    for k, (h, d) in enumerate(zip(host, dev)):
        assert d.end == h.end, k
        hp, dp = h.align_path(0, 1), d.align_path(0, 1)
        for row in hp:
            np.testing.assert_array_equal(np.asarray(dp[row]), np.asarray(hp[row]))


def test_device_guide_end_to_end_span(ref_data, monkeypatch):
    """The whole guide graph (random spanning graph -> MST merge) built
    through the device route equals the host route's multiple alignment."""
    from historian_tpu.engine.span import AlignGraph
    from historian_tpu.utils.rng import MT19937

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "gp120.fa"))

    def build():
        return AlignGraph(
            seqs, model, 1.0, DiagEnvParams(), MT19937(5489)
        ).mst_gapped()

    monkeypatch.setenv("HISTORIAN_DEVICE_GUIDE", "0")
    host = build()
    monkeypatch.setenv("HISTORIAN_DEVICE_GUIDE", "1")
    dev = build()
    assert [(s.name, s.seq) for s in dev] == [(s.name, s.seq) for s in host]
