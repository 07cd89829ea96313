"""Device-resident merge fills + device traceback (ops/tracedp,
devicedp.DeviceTraceFill, engine deferred-cells mode).

On CPU the device path runs in f64, so against the host fill:
- lp_end must match to round-off,
- the BEST trace (deterministic argmax walk) must be identical,
- sampled traces must be structurally valid paths of the host DP
  (every step a host source_transitions candidate),
- ensure_cells() must reproduce the host band for late full-band
  consumers (BackwardMatrix).
"""

import os

import numpy as np
import pytest

from historian_tpu.core.seqs import read_fasta
from historian_tpu.engine.forward import ForwardMatrix
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.models.ratemodel import ProbModel, RateModel
from historian_tpu.utils.rng import MT19937


def _setup(ref_data, monkeypatch, n=3, cut=160):
    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "0")
    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "gp120.fa"))[:n]
    for s in seqs:
        s.seq = s.seq[:cut]
    profs = [
        Profile.from_sequence(model.components, model.alphabet, s, i)
        for i, s in enumerate(seqs)
    ]
    hmm = PairHMM(ProbModel(model, 0.6), ProbModel(model, 0.4), model.ins_prob)
    f01 = ForwardMatrix(profs[0], profs[1], hmm, n)
    p01 = f01.sample_profile(MT19937(5489), 10, 0)
    assert p01.as_chain() is None  # genuine DAG y
    hmm2 = PairHMM(ProbModel(model, 0.3), ProbModel(model, 0.7), model.ins_prob)
    return model, profs, p01, hmm2


def _device_forward(profs, p01, hmm2, monkeypatch, n):
    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "1")
    monkeypatch.setenv("HISTORIAN_DEVICE_TRACE", "1")
    dev = ForwardMatrix(profs[2], p01, hmm2, n + 1, defer_cells=True)
    assert dev._trace_handle is not None, "device-trace route not taken"
    return dev


def test_device_trace_lp_end_and_best_trace(ref_data, monkeypatch):
    model, profs, p01, hmm2 = _setup(ref_data, monkeypatch)
    host = ForwardMatrix(profs[2], p01, hmm2, 4)
    dev = _device_forward(profs, p01, hmm2, monkeypatch, 3)

    assert np.isfinite(dev.lp_end)
    assert abs(dev.lp_end - host.lp_end) < 1e-9

    host_best = host.best_trace()
    dev_best = dev._device_best_path()
    assert dev_best == host_best

    # align path and profile built from the device best trace match
    hp = host.best_align_path()
    dpth = dev.best_align_path()
    assert set(hp) == set(dpth)
    for row in hp:
        np.testing.assert_array_equal(np.asarray(dpth[row]), np.asarray(hp[row]))
    hprof = host.best_profile()
    dprof = dev.best_profile()
    assert hprof.size == dprof.size
    assert [t.lp for t in hprof.trans] == pytest.approx(
        [t.lp for t in dprof.trans], rel=1e-9
    )


def test_device_trace_sampled_paths_are_valid(ref_data, monkeypatch):
    model, profs, p01, hmm2 = _setup(ref_data, monkeypatch)
    host = ForwardMatrix(profs[2], p01, hmm2, 4)
    dev = _device_forward(profs, p01, hmm2, monkeypatch, 3)

    paths = dev._device_traces(8, False, MT19937(17))
    assert len(paths) == 8
    for path in paths:
        assert path[0][:2] == (0, 0)
        assert path[-1] == dev.end_cell
        # every step must be a candidate of the host DP's traceback
        for a, b in zip(path[:-1], path[1:]):
            cands = host.source_transitions_without_emit_or_absorb(b)
            assert a in cands, (a, b)
        # and the sampled-path cells must be reachable (finite) in the
        # host fill
        for c in path[:-1]:
            assert np.isfinite(host.cells[c[0], c[1], c[2]]), c
        # values recorded for make_profile match the host cells
        for c in path[:-1]:
            assert dev._trace_values[c] == pytest.approx(
                float(host.cells[c[0], c[1], c[2]]), rel=1e-9
            )


def test_device_trace_sample_profile_and_backward_fallback(ref_data, monkeypatch):
    model, profs, p01, hmm2 = _setup(ref_data, monkeypatch)
    host = ForwardMatrix(profs[2], p01, hmm2, 4)
    dev = _device_forward(profs, p01, hmm2, monkeypatch, 3)

    prof = dev.sample_profile(MT19937(5489), 10, 0)
    prof.assert_transitions_consistent()
    prof.assert_path_to_end_exists()

    # late full-band consumer: ensure_cells materializes the host band
    from historian_tpu.engine.forward import BackwardMatrix

    bwd = BackwardMatrix(dev)
    hc = np.where(np.isfinite(host.cells), host.cells, -1.0e99)
    dc = np.where(np.isfinite(dev.cells), dev.cells, -1.0e99)
    np.testing.assert_allclose(dc, hc, rtol=1e-9, atol=1e-9)
    assert abs(bwd.lp_start - dev.lp_end) < 0.01 * max(1.0, abs(dev.lp_end))


def test_device_trace_chain_chain_merge(ref_data, monkeypatch):
    """-fast-style chain x chain merges route through the same handle."""
    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "0")
    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "PF16593.pair.fa"))
    x = Profile.from_sequence(model.components, model.alphabet, seqs[0], 0)
    y = Profile.from_sequence(model.components, model.alphabet, seqs[1], 1)
    hmm = PairHMM(ProbModel(model, 0.8), ProbModel(model, 0.4), model.ins_prob)
    host = ForwardMatrix(x, y, hmm, 2)
    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "1")
    monkeypatch.setenv("HISTORIAN_DEVICE_TRACE", "1")
    dev = ForwardMatrix(x, y, hmm, 2, defer_cells=True)
    assert dev._trace_handle is not None
    assert abs(dev.lp_end - host.lp_end) < 1e-9
    assert dev._device_best_path() == host.best_trace()


@pytest.mark.slow
def test_device_trace_end_to_end_recon(ref_data):
    """recon -fast with device fills + device tracebacks produces a valid
    reconstruction (leaves preserved; deterministic given the seed)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(
        HISTORIAN_PLATFORM="cpu", HISTORIAN_DEVICE_DP="1",
        HISTORIAN_DEVICE_TRACE="1",
    )
    args = [
        sys.executable, "-m", "historian_tpu", "recon", "-output", "fasta",
        "-model", os.path.join(ref_data, "testamino.json"),
        "-seqs", os.path.join(ref_data, "gp120.fa"),
    ]
    out = subprocess.run(args, capture_output=True, text=True, timeout=900,
                         env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    out2 = subprocess.run(args, capture_output=True, text=True, timeout=900,
                          env=env, cwd="/root/repo")
    assert out.stdout == out2.stdout  # deterministic given seed
    rows = {}
    for block in out.stdout.split(">")[1:]:
        name, seq = block.split("\n", 1)
        rows[name.strip()] = seq.replace("\n", "").replace("-", "")
    for s in read_fasta(os.path.join(ref_data, "gp120.fa")):
        assert rows[s.name] == s.seq  # leaves pass through exactly
