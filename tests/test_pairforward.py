"""Device chain-pair Forward kernel vs the host DAG DP (exact agreement)."""

import numpy as np
import pytest

from historian_tpu.core.alignpath import GuideAlignmentEnvelope
from historian_tpu.core.seqs import read_fasta
from historian_tpu.engine.forward import ForwardMatrix
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.models.ratemodel import ProbModel, RateModel
from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward


@pytest.mark.parametrize(
    "model_file,seq_file,tx,ty",
    [
        ("testforward.jukescantor.json", "testforward.len2.fa", 1.0, 1.0),
        ("testforward.jukescantor.json", "testforward.len2-4.fa", 0.1, 0.01),
        ("testforward.jukescantor.json", "testforward.len2-4.fa", 0.01, 1.0),
        ("testamino.json", "PF16593.pair.fa", 1.0, 0.5),
    ],
)
def test_device_kernel_matches_host(ref_data, model_file, seq_file, tx, ty):
    model = RateModel.from_file(f"{ref_data}/{model_file}")
    seqs = read_fasta(f"{ref_data}/{seq_file}")
    xp, yp = ProbModel(model, tx), ProbModel(model, ty)
    hmm = PairHMM(xp, yp, model.ins_prob)
    xprof = Profile.from_sequence(1, model.alphabet, seqs[0], 1)
    yprof = Profile.from_sequence(1, model.alphabet, seqs[1], 2)
    fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())

    args, _ = chain_pair_forward_arrays(model, seqs[0].seq, seqs[1].seq, tx, ty, dtype=np.float64)
    cells, lp_end = pair_forward(*args)
    assert abs(float(lp_end) - fwd.lp_end) < 1e-9

    x1, y1 = len(seqs[0].seq) + 1, len(seqs[1].seq) + 1
    host = np.where(np.isfinite(fwd.cells[:x1, :y1]), fwd.cells[:x1, :y1], -1e30)
    device = np.asarray(cells)
    diff = np.abs(np.clip(host, -1e29, None) - np.clip(device, -1e29, None))
    assert diff.max() < 1e-9


def test_graft_entry_runs():
    import __graft_entry__ as g
    import jax

    fn, args = g.entry()
    lp = jax.jit(fn)(*args)
    assert np.isfinite(float(lp))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_forward_matches_exhaustive_path_enumeration(ref_data):
    """Independent oracle: enumerate every state path of the composed
    transducer for tiny sequences by DFS, with emissions computed
    directly from the model matrices, and compare the total path
    probability against the device kernel and the host fill.

    The 5 live states absorb/emit as (reference pairhmm.h:14-18):
    IMM both tokens (root insert + two substitutions), IMD x with y
    deleted, IDM y with x deleted, IMI y inserted on the right branch,
    IIW x inserted on the left branch; y-absorbing states are only
    reachable while x is in its Wait state (canonical gap order), which
    the transition table already encodes.
    """
    from historian_tpu.engine.pairhmm import EEE, IMD, IDM, IMI, IIW, IMM, PairHMM
    from historian_tpu.models.ratemodel import ProbModel

    model = RateModel.from_file(f"{ref_data}/testforward.jukescantor.json")
    xp = ProbModel(model, 1.0)
    yp = ProbModel(model, 0.5)
    hmm = PairHMM(xp, yp, model.ins_prob)

    tok = model.alphabet.tokenize_or_die
    w = model.cpt_weight
    root = model.ins_prob  # [C, A]
    subx = xp.sub_mat  # [C, A, A]
    suby = yp.sub_mat
    insx = xp.ins_vec if hasattr(xp, "ins_vec") else model.ins_prob
    insy = yp.ins_vec if hasattr(yp, "ins_vec") else model.ins_prob

    def emit(state, xi, yj):
        if state == IMM:
            return float(sum(w[c] * sum(root[c, a] * subx[c, a, xi] * suby[c, a, yj]
                                        for a in range(model.alphabet_size))
                             for c in range(model.components)))
        if state == IMD:
            return float(sum(w[c] * sum(root[c, a] * subx[c, a, xi]
                                        for a in range(model.alphabet_size))
                             for c in range(model.components)))
        if state == IDM:
            return float(sum(w[c] * sum(root[c, a] * suby[c, a, yj]
                                        for a in range(model.alphabet_size))
                             for c in range(model.components)))
        if state == IIW:
            return float(sum(w[c] * insx[c, xi] for c in range(model.components)))
        if state == IMI:
            return float(sum(w[c] * insy[c, yj] for c in range(model.components)))
        raise AssertionError(state)

    import math as _math

    for x_seq, y_seq in [("AG", "AT"), ("A", "CGT"), ("ACG", ""), ("AC", "AC")]:
        xt = [tok(ch) for ch in x_seq]
        yt = [tok(ch) for ch in y_seq]
        X, Y = len(xt), len(yt)

        total = [0.0]

        def dfs(i, j, state, prob):
            # transition into EEE ends the path; only legal with all
            # tokens absorbed
            if i == X and j == Y:
                lp = hmm.lp_trans(state, EEE)
                if lp > -1e29:
                    total[0] += prob * _math.exp(lp)
            for nxt in (IMM, IMD, IDM, IMI, IIW):
                lp = hmm.lp_trans(state, nxt)
                if lp <= -1e29:
                    continue
                # canonical gap ordering (reference forward.cpp:95-162):
                # x-absorbing states are blocked once y is exhausted and
                # y-absorbing states once x is exhausted -- equivalent gap
                # arrangements are counted exactly once
                if nxt == IMM and i < X and j < Y:
                    dfs(i + 1, j + 1, nxt, prob * _math.exp(lp) * emit(nxt, xt[i], yt[j]))
                elif nxt in (IMD, IIW) and i < X and (j < Y or Y == 0):
                    dfs(i + 1, j, nxt, prob * _math.exp(lp) * emit(nxt, xt[i], 0))
                elif nxt in (IDM, IMI) and j < Y and (i < X or X == 0):
                    dfs(i, j + 1, nxt, prob * _math.exp(lp) * emit(nxt, 0, yt[j]))

        # start state is IMM at (0, 0) with probability 1
        dfs(0, 0, IMM, 1.0)
        lp_brute = _math.log(total[0])

        args, _ = chain_pair_forward_arrays(model, x_seq, y_seq, 1.0, 0.5, dtype=np.float64)
        _, lp_kernel = pair_forward(*args)
        assert abs(float(lp_kernel) - lp_brute) < 1e-9, (x_seq, y_seq, float(lp_kernel), lp_brute)


@pytest.mark.slow
def test_fuzz_random_models_kernel_vs_host(ref_data):
    """Seeded fuzz: random reversible-ish rate models and random sequence
    pairs; the device chain kernel and the host DAG fill must agree."""
    from historian_tpu.core.alphabet import Alphabet
    from historian_tpu.core.seqs import FastSeq

    rng = np.random.RandomState(7)
    alph = Alphabet("ACGT")
    for case in range(8):
        rate = rng.uniform(0.1, 1.5, (4, 4))
        np.fill_diagonal(rate, 0.0)
        np.fill_diagonal(rate, -rate.sum(1))
        ins_p = rng.dirichlet(np.ones(4))
        model = RateModel(
            alph,
            ins_rate=rng.uniform(0.005, 0.1), del_rate=rng.uniform(0.005, 0.1),
            ins_ext_prob=rng.uniform(0.1, 0.8), del_ext_prob=rng.uniform(0.1, 0.8),
            sub_rate=rate[None], cpt_weight=np.ones(1), ins_prob=ins_p[None],
        )
        n1, n2 = rng.randint(1, 9, size=2)
        x = "".join(rng.choice(list("ACGT"), n1))
        y = "".join(rng.choice(list("ACGT"), n2))
        tx, ty = rng.uniform(0.05, 1.5, size=2)
        args, hmm = chain_pair_forward_arrays(model, x, y, tx, ty, dtype=np.float64)
        _, lp_kernel = pair_forward(*args)
        xprof = Profile.from_sequence(1, alph, FastSeq(name="x", seq=x), 1)
        yprof = Profile.from_sequence(1, alph, FastSeq(name="y", seq=y), 2)
        fwd = ForwardMatrix(xprof, yprof, hmm, 0, GuideAlignmentEnvelope())
        assert abs(float(lp_kernel) - fwd.lp_end) < 1e-9, (case, x, y, float(lp_kernel), fwd.lp_end)
