"""Transducer-composition Forward/Backward tests vs reference goldens.

Mirrors t/testseqprofile.cpp, t/testforward.cpp, t/testnullforward.cpp and
t/testbackward.cpp (reference Makefile:239-257) on the same data files.
"""

import os

import numpy as np
import pytest

from historian_tpu.core.alignpath import GuideAlignmentEnvelope
from historian_tpu.core.seqs import FastSeq, read_fasta
from historian_tpu.engine.forward import (
    COLLAPSE_CHAINS,
    KEEP_ALL,
    BackwardMatrix,
    ForwardMatrix,
)
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.models.ratemodel import ProbModel, RateModel
from historian_tpu.utils.rng import MT19937

from .golden import assert_text_match


def data(ref_data, name):
    return os.path.join(ref_data, name)


def run_testforward(ref_data, strategy, what, seq_file, model_file, xtime, ytime=None):
    """Reimplementation of the t/testforward.cpp harness."""
    seqs = read_fasta(data(ref_data, seq_file))
    model = RateModel.from_file(data(ref_data, model_file))
    xprobs = ProbModel(model, xtime)
    yprobs = ProbModel(model, ytime if ytime is not None else xtime)
    hmm = PairHMM(xprobs, yprobs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, seqs[0], 1)
    yprof = Profile.from_sequence(1, model.alphabet, seqs[1], 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())

    if what == "matrix":
        all_cells = {fwd.start_cell, fwd.end_cell}
        for xpos in range(xprof.size - 1):
            for ypos in range(yprof.size - 1):
                for s in PairHMM.states():
                    if xpos > 0 or ypos > 0:
                        all_cells.add((xpos, ypos, s))
        prof = fwd.make_profile(all_cells, strategy)
    elif what == "best":
        prof = fwd.best_profile(strategy)
    else:
        rng = MT19937()
        prof = fwd.sample_profile(rng, int(what), 0, strategy)

    prof.calc_sum_path_absorb_probs(np.zeros(1), hmm.log_root)
    return prof, fwd


def test_seqprofile_golden(ref_data):
    """Leaf profile JSON for sequence AAGCT (testseqprofile)."""
    from historian_tpu.core.alphabet import Alphabet

    prof = Profile.from_sequence(1, Alphabet("ACGT"), FastSeq(name="", seq="AAGCT"), 0)
    with open(data(ref_data, "testseqprofile.aagct.json")) as f:
        assert prof.to_json() == f.read()


@pytest.mark.parametrize(
    "strategy,what,seq_file,model_file,xtime,ytime,golden",
    [
        (COLLAPSE_CHAINS, "best", "testforward.len2.fa", "testforward.nosub.json", 1, None, "testforward.len2.nosub.best.out"),
        (COLLAPSE_CHAINS, "best", "testforward.len2.fa", "testforward.jukescantor.json", 1, None, "testforward.len2.jc.best.out"),
        (COLLAPSE_CHAINS, "best", "testforward.len2-4.fa", "testforward.jukescantor.json", 0.1, 0.01, "testforward.len2-4.xdel.out"),
        (COLLAPSE_CHAINS, "best", "testforward.len2-4.fa", "testforward.jukescantor.json", 0.01, 1, "testforward.len2-4.yins.out"),
        (KEEP_ALL, "matrix", "testforward.id100.len2.fa", "testforward.nosub.json", 1, None, "testforward.id100.len2.nosub.out"),
    ],
)
def test_forward_golden(ref_data, strategy, what, seq_file, model_file, xtime, ytime, golden):
    prof, _ = run_testforward(ref_data, strategy, what, seq_file, model_file, xtime, ytime)
    with open(data(ref_data, golden)) as f:
        expected = f.read()
    assert_text_match(prof.to_json(), expected, sig_figs=4)


@pytest.mark.parametrize(
    "strategy,golden",
    [
        (KEEP_ALL, "testforward.len2-4.n10.all.out"),
        (COLLAPSE_CHAINS, "testforward.len2-4.n10.hubs.out"),
    ],
)
def test_forward_sampled_golden(ref_data, strategy, golden):
    """n=10 sampled tracebacks with the default mt19937 seed: requires
    bit-compatible RNG + draw order to reproduce the reference's cell set."""
    prof, _ = run_testforward(
        ref_data, strategy, "10", "testforward.len2-4.fa", "testforward.jukescantor.json", 0.1
    )
    with open(data(ref_data, golden)) as f:
        expected = f.read()
    assert_text_match(prof.to_json(), expected, sig_figs=4)


def test_forward_cumlp_consistency(ref_data):
    """The -matrix profile's total path likelihood must equal the Forward
    likelihood (perl/testcumlp.pl: cumLogProb of END == cell 51's value)."""
    prof, fwd = run_testforward(
        ref_data, KEEP_ALL, "matrix", "testforward.id100.len2.fa", "testforward.nosub.json", 1
    )
    hmm = fwd.hmm
    total = prof.calc_sum_path_absorb_probs(np.zeros(1), hmm.log_root, tag=None)
    assert abs(total - fwd.lp_end) < 1e-6


def test_null_forward(ref_data):
    """Profiles with null states spliced into the chain
    (t/testnullforward.cpp nullifies x state 2 and y state 1), full-matrix
    KeepAll profile vs golden."""
    model = RateModel.from_file(data(ref_data, "testforward.nosub.json"))
    probs = ProbModel(model, 1.0)
    hmm = PairHMM(probs, probs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, FastSeq(name="x", seq="acg"), 1)
    yprof = Profile.from_sequence(1, model.alphabet, FastSeq(name="y", seq="cag"), 2)
    xprof.states[2].lp_absorb = None
    yprof.states[1].lp_absorb = None
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
    all_cells = {fwd.start_cell, fwd.end_cell}
    for xpos in range(xprof.size - 1):
        for ypos in range(yprof.size - 1):
            for s in PairHMM.states():
                if xpos > 0 or ypos > 0:
                    all_cells.add((xpos, ypos, s))
    prof = fwd.make_profile(all_cells, KEEP_ALL)
    prof.calc_sum_path_absorb_probs(np.zeros(1), hmm.log_root)
    with open(data(ref_data, "testnullforward.nosub.out")) as f:
        assert_text_match(prof.to_json(), f.read(), sig_figs=4)


def test_empty_sequence_forward(ref_data):
    """Two genuinely empty sequences still give a finite likelihood."""
    model = RateModel.from_file(data(ref_data, "testforward.nosub.json"))
    probs = ProbModel(model, 1.0)
    hmm = PairHMM(probs, probs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, FastSeq(name="x", seq=""), 1)
    yprof = Profile.from_sequence(1, model.alphabet, FastSeq(name="y", seq=""), 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
    assert np.isfinite(fwd.lp_end)


@pytest.mark.parametrize(
    "seq_file", ["testforward.len2.fa", "testforward.len2-4.fa"]
)
def test_backward_agrees_with_forward(ref_data, seq_file):
    """Fwd and Bwd total likelihoods agree (tolerance 0.01, reference
    FWD_BACK_ERROR_TOLERANCE)."""
    seqs = read_fasta(data(ref_data, seq_file))
    model = RateModel.from_file(data(ref_data, "testforward.jukescantor.json"))
    probs = ProbModel(model, 1.0)
    hmm = PairHMM(probs, probs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, seqs[0], 1)
    yprof = Profile.from_sequence(1, model.alphabet, seqs[1], 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
    bwd = BackwardMatrix(fwd)
    assert abs(bwd.lp_start - fwd.lp_end) < 1e-9
    # posterior probs of cells sum sensibly: start cell posterior == 1
    assert abs(bwd.cell_post_prob(fwd.start_cell) - 1.0) < 1e-9


def test_backward_posterior_profile(ref_data):
    """postProbProfile produces a valid profile containing the best trace."""
    seqs = read_fasta(data(ref_data, "testforward.len2-4.fa"))
    model = RateModel.from_file(data(ref_data, "testforward.jukescantor.json"))
    probs = ProbModel(model, 1.0)
    hmm = PairHMM(probs, probs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, seqs[0], 1)
    yprof = Profile.from_sequence(1, model.alphabet, seqs[1], 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
    bwd = BackwardMatrix(fwd)
    prof = bwd.post_prob_profile(0.1, 0, COLLAPSE_CHAINS)
    total = prof.calc_sum_path_absorb_probs(np.zeros(1), hmm.log_root, tag=None)
    # profile's path sum is <= full forward likelihood, close for small cases
    assert total <= fwd.lp_end + 1e-6
    assert total > fwd.lp_end - 1.0


def test_slow_fill_consistency(ref_data):
    """Every forward cell equals the logsumexp over its source cells
    (reference slowFillTest, forward.cpp:1099-1123)."""
    prof, fwd = run_testforward(
        ref_data, KEEP_ALL, "matrix", "testforward.len2.fa", "testforward.jukescantor.json", 1
    )
    for i in range(fwd.x_size - 1):
        for j in range(fwd.y_size - 1):
            for s in PairHMM.states():
                if (i, j, s) == fwd.start_cell:
                    continue
                lp = -np.inf
                for src, lp_t in fwd.source_transitions((i, j, s)).items():
                    lp = np.logaddexp(lp, lp_t + fwd.cells[src[0], src[1], src[2]])
                got = fwd.cells[i, j, s]
                if np.isfinite(got) or np.isfinite(lp):
                    assert abs(got - lp) < 1e-9, f"cell {(i, j, s)}: {got} vs {lp}"


@pytest.mark.parametrize(
    "seq_file,golden",
    [("testforward.len2.fa", "testbackward.len2.out"),
     ("testforward.len2-4.fa", "testbackward.len2-4.out")],
)
def test_backward_golden(ref_data, seq_file, golden):
    """Reference t/testbackward.cpp golden: Fwd/Bwd scores and the set of
    cells with posterior > 0.5 (ordering within posterior ties is std
    priority-queue heap order in the reference; compared as a set here)."""
    seqs = read_fasta(data(ref_data, seq_file))
    model = RateModel.from_file(data(ref_data, "testforward.jukescantor.json"))
    probs = ProbModel(model, 1.0)
    hmm = PairHMM(probs, probs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, seqs[0], 1)
    yprof = Profile.from_sequence(1, model.alphabet, seqs[1], 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
    bwd = BackwardMatrix(fwd)

    lines = open(data(ref_data, golden)).read().splitlines()
    ref_fwd = float(lines[0].split(": ")[1])
    ref_bwd = float(lines[1].split(": ")[1])
    assert abs(fwd.lp_end - ref_fwd) < 5e-6 * abs(ref_fwd)
    assert abs(bwd.lp_start - ref_bwd) < 5e-6 * abs(ref_bwd)

    ref_cells = {}
    for ln in lines[2:]:
        name, val = ln[1:].split(" = ")
        ref_cells[name] = float(val)
    got = bwd.cells_above_post_prob_threshold(0.5)
    got_cells = {bwd.cell_name(c): float(np.exp(lpp)) for lpp, c in got}
    assert set(got_cells) == set(ref_cells)
    for name, p in ref_cells.items():
        assert abs(got_cells[name] - p) < 1e-4
    # descending posterior order, as the reference's priority queue pops
    probs_list = [lpp for lpp, _ in got]
    assert probs_list == sorted(probs_list, reverse=True)


def test_fwd_bwd_mismatch_diagnostic(ref_data, capsys):
    """Forced corruption of the forward fill must trigger the slow-fill
    diagnostic (reference forward.cpp:1099-1170): the 0.01 consistency
    check re-fills through the pure-python path and reports the
    divergent cells on stderr."""
    seqs = read_fasta(data(ref_data, "testforward.len2.fa"))
    model = RateModel.from_file(data(ref_data, "testforward.jukescantor.json"))
    probs = ProbModel(model, 1.0)
    hmm = PairHMM(probs, probs, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, seqs[0], 1)
    yprof = Profile.from_sequence(1, model.alphabet, seqs[1], 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
    # corrupt one live cell and the end gather (a kernel-routing bug's
    # signature: fill values inconsistent with the backward pass)
    fwd.ensure_cells()
    fwd.cells[1, 1, 0] += 5.0
    fwd.lp_end += 5.0
    BackwardMatrix(fwd)
    err = capsys.readouterr().err
    assert "running slow-fill diagnostic" in err
    assert "state-cells differ" in err
    assert "worst cell" in err
