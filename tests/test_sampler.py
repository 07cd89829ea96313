"""Refiner and MCMC sampler tests: self-consistency invariants.

The reference golden-tests none of its MCMC outputs (stochastic and
platform-sensitive); its own checks are traceback-total asserts and
fwd/vit agreement, mirrored here.
"""

import os

import numpy as np
import pytest

from historian_tpu.core.alignpath import Alignment, GuideAlignmentEnvelope
from historian_tpu.core.seqs import read_fasta
from historian_tpu.core.tree import Tree
from historian_tpu.engine.branchmatrix import BranchMatrix
from historian_tpu.engine.treealign import (
    History,
    SimpleTreePrior,
    get_conditional_pwms,
    log_likelihood,
)
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.sampler.refiner import Refiner
from historian_tpu.sampler.sampler import Sampler, triple_path
from historian_tpu.sampler.sibling import SiblingMatrix
from historian_tpu.utils.rng import MT19937


def load(ref_data):
    model = RateModel.from_file(os.path.join(ref_data, "testcount.jukescantor.json"))
    tree = Tree(open(os.path.join(ref_data, "testcount.nh")).read())
    gapped = read_fasta(os.path.join(ref_data, "testcount.historian.fa"))
    gapped = tree.reorder_seqs(gapped)
    return model, tree, gapped


def test_refiner_improves_loglik(ref_data):
    model, tree, gapped = load(ref_data)
    lp0 = log_likelihood(model, tree, gapped)
    _, refined = Refiner(model).refine(tree, gapped)
    lp1 = log_likelihood(model, tree, refined)
    assert lp1 >= lp0 - 1e-9


def test_branch_matrix_viterbi_vs_forward(ref_data):
    model, tree, gapped = load(ref_data)
    node = 0
    parent = tree.parent(node)
    pwms = get_conditional_pwms(model, tree, gapped, {node: parent, parent: node})
    args = (
        model, pwms[parent], pwms[node], tree.branch_length(node), GuideAlignmentEnvelope(),
        np.arange(len(pwms[parent]) + 1), np.arange(len(pwms[node]) + 1), parent, node,
    )
    vit = BranchMatrix(*args, viterbi=True)
    fwd = BranchMatrix(*args, viterbi=False)
    best = vit.best()
    # Viterbi end score equals the best path's score; forward dominates
    assert abs(vit.log_path_prob(best) - vit.lp_end) < 1e-9
    assert fwd.lp_end >= vit.lp_end - 1e-9
    # sampled paths have valid posterior probabilities
    rng = MT19937(123)
    for _ in range(5):
        path = fwd.sample(rng)
        lpp = fwd.log_post_prob(path)
        assert lpp <= 1e-9
        assert np.isfinite(lpp)


def test_sibling_matrix_consistency(ref_data):
    model, tree, gapped = load(ref_data)
    # node = parent23 (internal), children seq2 seq3
    node = tree.find_node("parent23")
    l_child, r_child = tree.children(node)
    exclude = {l_child: node, r_child: node}
    pwms = get_conditional_pwms(model, tree, gapped, exclude)
    sib = SiblingMatrix(
        model, pwms[l_child], pwms[r_child],
        tree.branch_length(l_child), tree.branch_length(r_child),
        GuideAlignmentEnvelope(),
        np.arange(len(pwms[l_child]) + 1), np.arange(len(pwms[r_child]) + 1),
        l_child, r_child, node,
    )
    assert np.isfinite(sib.lp_end)
    rng = MT19937(99)
    for _ in range(5):
        path = sib.sample(rng)
        # parent/child residue counts consistent
        assert path[l_child].sum() == len(pwms[l_child])
        assert path[r_child].sum() == len(pwms[r_child])
        lpp = sib.log_post_prob(path)
        assert np.isfinite(lpp) and lpp <= 1e-9
        pwm = sib.parent_seq(path)
        assert pwm.shape[0] == path[node].sum()
        # PWM rows normalized
        from scipy.special import logsumexp

        np.testing.assert_allclose(logsumexp(pwm, axis=(1, 2)), 0.0, atol=1e-9)


def test_triple_path_roundtrip(ref_data):
    model, tree, gapped = load(ref_data)
    align = Alignment.from_gapped(gapped)
    node = tree.find_node("parent23")
    l_child, r_child = tree.children(node)
    tp = triple_path(align.path, l_child, r_child, node)
    assert tp[l_child].sum() == align.path[l_child].sum()
    assert tp[r_child].sum() == align.path[r_child].sum()
    assert tp[node].sum() == align.path[node].sum()


def test_mcmc_chain_runs(ref_data):
    model, tree, gapped = load(ref_data)
    tree = tree.copy()
    tree.assign_internal_node_names()
    from historian_tpu.core.seqs import FastSeq

    rows = [FastSeq(name=tree.seq_name(n), seq=gapped[n].seq) for n in range(tree.n_nodes())]
    sampler = Sampler(model, SimpleTreePrior(), rows, name="test")
    sampler.initialize(History(gapped=rows, tree=tree))
    rng = MT19937(5489)
    lp0 = sampler.current_lp
    for _ in range(40):
        sampler.sample(rng)
    assert np.isfinite(sampler.current_lp)
    assert sampler.best_lp >= lp0 - 1e-9
    assert sum(sampler.moves_proposed) == 40
    # at least some moves accepted, alignment stays flush
    assert sum(sampler.moves_accepted) > 0
    cols = {len(s.seq) for s in sampler.current_history.gapped}
    assert len(cols) == 1


def test_mcmc_fix_tree(ref_data):
    model, tree, gapped = load(ref_data)
    tree = tree.copy()
    tree.assign_internal_node_names()
    from historian_tpu.core.seqs import FastSeq

    rows = [FastSeq(name=tree.seq_name(n), seq=gapped[n].seq) for n in range(tree.n_nodes())]
    sampler = Sampler(model, SimpleTreePrior(), rows, name="fixtree")
    sampler.initialize(History(gapped=rows, tree=tree))
    sampler.fix_tree()
    rng = MT19937(7)
    t0 = sampler.current_history.tree.to_string()
    for _ in range(20):
        sampler.sample(rng)
    assert sampler.current_history.tree.to_string() == t0  # tree untouched


import pytest as _pytest


@_pytest.mark.parametrize("band", [-1, 1])
def test_sibling_device_kernel_matches_host(ref_data, band):
    """ops/siblingdp device fill == host SiblingMatrix fill (all 11
    states, every cell, and lp_end), full and banded envelopes."""
    from historian_tpu.core.alignpath import Alignment
    from historian_tpu.ops.siblingdp import pack_sibling_transitions, sibling_forward

    model, tree, gapped = load(ref_data)
    node = tree.find_node("parent23")
    l_child, r_child = tree.children(node)
    exclude = {l_child: node, r_child: node}
    pwms = get_conditional_pwms(model, tree, gapped, exclude)
    if band > 0:
        rows = {r: np.array([ch != "-" for ch in gapped[r].seq], bool) for r in (l_child, r_child)}
        env = GuideAlignmentEnvelope(rows, l_child, r_child, band)
    else:
        env = GuideAlignmentEnvelope()
    sib = SiblingMatrix(
        model, pwms[l_child], pwms[r_child],
        tree.branch_length(l_child), tree.branch_length(r_child),
        env,
        np.arange(len(pwms[l_child]) + 1), np.arange(len(pwms[r_child]) + 1),
        l_child, r_child, node,
    )
    trans = pack_sibling_transitions(sib)
    match_emit = np.where(np.isfinite(sib.match_emit), sib.match_emit, -1e30)
    cells, lp_end = sibling_forward(
        np.asarray(sib.l_emit, np.float64), np.asarray(sib.r_emit, np.float64),
        np.asarray(match_emit, np.float64), np.asarray(sib.mask), trans,
    )
    cells = np.asarray(cells)
    host = np.where(np.isfinite(sib.cells), sib.cells, -1e30)
    finite = host > -1e29
    np.testing.assert_allclose(cells[finite], host[finite], atol=1e-9, rtol=1e-9)
    # device treats -1e30 as -inf; host -inf cells must stay huge-negative
    assert np.all(cells[~finite] < -1e28)
    assert abs(float(lp_end) - sib.lp_end) < 1e-9


def test_sibling_fill_matches_exhaustive_enumeration(ref_data):
    """Independent oracle for the sibling DP: DFS over every raw state
    path (explicit IDD self-loops, truncated; the fill uses the
    analytically eliminated table) on 2-residue PWMs."""
    import math

    model, tree, gapped = load(ref_data)
    node = tree.find_node("parent23")
    l_child, r_child = tree.children(node)
    exclude = {l_child: node, r_child: node}
    pwms = get_conditional_pwms(model, tree, gapped, exclude)
    sib = SiblingMatrix(
        model, pwms[l_child][:2], pwms[r_child][:2],
        tree.branch_length(l_child), tree.branch_length(r_child),
        GuideAlignmentEnvelope(),
        np.arange(3), np.arange(3), l_child, r_child, node,
    )
    from historian_tpu.sampler.sibling import (
        EEE, IDD, IDI, IDM, IIW, IIX, IMD, IMI, IMM, N_STATES, WWW, WWX, WXW,
    )

    X = Y = 2
    consume_x = {IMM: 1, IMD: 1, IIW: 1, IIX: 1}
    consume_y = {IMM: 1, IDM: 1, IMI: 1, IDI: 1}
    total = [0.0]
    max_depth = 26  # covers all consuming paths + null runs + IDD loops

    def emit(state, x, y):
        if state == IMM:
            return math.exp(sib.match_emit[x, y])
        if state in (IMD, IIW, IIX):
            return math.exp(sib.l_emit[x - 1])
        if state in (IDM, IMI, IDI):
            return math.exp(sib.r_emit[y - 1])
        return 1.0  # W states and IDD emit nothing in (l, r) coordinates

    def dfs(x, y, state, prob, depth):
        if prob == 0.0 or depth > max_depth:
            return
        if x == X and y == Y:
            lp = sib.lp_trans(state, EEE)
            if lp > -1e29:
                total[0] += prob * math.exp(lp)
        for nxt in range(N_STATES):
            lp = sib.lp_trans(state, nxt)
            if lp <= -1e29:
                continue
            nx = x + consume_x.get(nxt, 0)
            ny = y + consume_y.get(nxt, 0)
            if nx > X or ny > Y:
                continue
            dfs(nx, ny, nxt, prob * math.exp(lp) * emit(nxt, nx, ny), depth + 1)

    dfs(0, 0, IMM, 1.0, 0)
    lp_brute = math.log(total[0])
    assert abs(sib.lp_end - lp_brute) < 1e-9, (sib.lp_end, lp_brute)


def test_simulator_substitutions_match_expm():
    """Statistical check: simulating one long branch reproduces the
    matrix-exponential substitution probabilities."""
    from historian_tpu.core.alphabet import Alphabet
    from historian_tpu.core.tree import Tree
    from historian_tpu.models.ratemodel import ProbModel, RateModel
    from historian_tpu.sampler.simulator import simulate_tree
    from historian_tpu.utils.rng import MT19937

    alph = Alphabet("ACGT")
    rate = np.array([[0.0, 0.6, 0.2, 0.2],
                     [0.3, 0.0, 0.3, 0.4],
                     [0.2, 0.5, 0.0, 0.3],
                     [0.4, 0.2, 0.4, 0.0]])
    np.fill_diagonal(rate, -rate.sum(1))
    model = RateModel(alph, ins_rate=0.0, del_rate=0.0, ins_ext_prob=0.5,
                      del_ext_prob=0.5, sub_rate=rate[None],
                      cpt_weight=np.ones(1), ins_prob=np.full((1, 4), 0.25))
    t = 0.8
    tree = Tree(f"(leaf:{t})root;")
    stock = simulate_tree(MT19937(123), model, tree, 20000)
    rows = {s.name: s.seq for s in stock.gapped}
    counts = np.zeros((4, 4))
    for pa, ch in zip(rows["root"], rows["leaf"]):
        if pa not in "-." and ch not in "-.":
            counts[alph.tokenize_or_die(pa.upper()), alph.tokenize_or_die(ch.upper())] += 1
    emp = counts / counts.sum(axis=1, keepdims=True)
    expected = ProbModel(model, t).sub_mat[0]
    # 20k draws: per-row frequencies within ~3 sigma of the expm row
    assert np.abs(emp - expected).max() < 0.02, np.abs(emp - expected).max()


@pytest.mark.slow
def test_mcmc_samples_node_height_posterior():
    """Statistical MH correctness: with the alignment fixed on a 2-leaf
    ultrametric tree, NodeHeight/Rescale moves must sample the root
    height from the posterior the sampler's own likelihood defines
    (catches Hastings/Jacobian errors that leave the chain running but
    targeting the wrong distribution)."""
    import math

    from historian_tpu.core.seqs import FastSeq
    from historian_tpu.core.tree import Tree
    from historian_tpu.models.presets import named_model
    from historian_tpu.sampler.sampler import History, Sampler, SimpleTreePrior

    model = named_model("jc")
    gapped = [FastSeq(name="a", seq="ACGTACGTAA"), FastSeq(name="b", seq="ACCTACGAAA")]
    sampler = Sampler(model, SimpleTreePrior(), gapped, name="post")
    tree0 = Tree("(a:0.5,b:0.5)root;")
    hist = History(gapped=gapped + [FastSeq(name="root", seq="**********")], tree=tree0)
    # rows must cover the tree's nodes in its order
    hist = History(gapped=[hist.gapped[n] for n in (0, 1, 2)], tree=tree0)
    sampler.initialize(hist, "post")
    sampler.fix_alignment()

    rng = MT19937(2024)
    heights = []
    for k in range(4000):
        sampler.sample(rng)
        heights.append(sampler.current_history.tree.branch_length(0))
    heights = np.array(heights[500:])  # burn-in

    # numeric posterior over the same likelihood
    hs = np.linspace(1e-3, 3.0, 600)
    lps = []
    for h in hs:
        t = Tree(f"(a:{h:.6f},b:{h:.6f})root;")
        lps.append(sampler.log_likelihood(History(gapped=hist.gapped, tree=t)))
    lps = np.array(lps)
    w = np.exp(lps - lps.max())
    w /= w.sum()
    mean_ref = float((hs * w).sum())
    sd_ref = float(np.sqrt(((hs - mean_ref) ** 2 * w).sum()))
    mean_mc = float(heights.mean())
    # MCMC autocorrelation makes the s.e. larger than iid; allow ~0.5 sd
    assert abs(mean_mc - mean_ref) < 0.5 * sd_ref, (mean_mc, mean_ref, sd_ref)
    assert abs(float(heights.std()) - sd_ref) < 0.25 * sd_ref


def test_branch_matrix_matches_exhaustive_enumeration(ref_data):
    """Independent oracle for the 3-state branch DP: DFS over every
    Match/Insert/Delete path on 2x2 PWMs equals the Forward lp_end."""
    import math

    from historian_tpu.engine.branchmatrix import BranchMatrix
    from historian_tpu.engine.branchmatrix import DELETE, INSERT, MATCH

    model, tree, gapped = load(ref_data)
    node = tree.find_node("parent23")
    l_child, _ = tree.children(node)
    pwms = get_conditional_pwms(model, tree, gapped, {l_child: node, node: l_child})
    x_pwm = pwms[node][:2]
    y_pwm = pwms[l_child][:2]
    bm = BranchMatrix(
        model, x_pwm, y_pwm, tree.branch_length(l_child),
        GuideAlignmentEnvelope(), np.arange(3), np.arange(3), node, l_child,
    )
    X = Y = 2
    consume = {MATCH: (1, 1), INSERT: (0, 1), DELETE: (1, 0)}

    def emit(state, i, j):
        if state == MATCH:
            return math.exp(bm.match_emit[i, j])
        if state == INSERT:
            return math.exp(bm.y_emit[j - 1])
        return 1.0

    total = [0.0]

    def dfs(i, j, state, prob):
        if i == X and j == Y:
            lp = bm.lp_trans(state, 3)  # END
            if np.isfinite(lp):
                total[0] += prob * math.exp(lp)
        for nxt in (MATCH, INSERT, DELETE):
            lp = bm.lp_trans(state, nxt)
            if not np.isfinite(lp):
                continue
            di, dj = consume[nxt]
            ni, nj = i + di, j + dj
            if ni > X or nj > Y:
                continue
            dfs(ni, nj, nxt, prob * math.exp(lp) * emit(nxt, ni, nj))

    dfs(0, 0, MATCH, 1.0)  # Start aliases Match
    assert abs(bm.lp_end - math.log(total[0])) < 1e-9, (bm.lp_end, math.log(total[0]))


def test_calc_ins_probs_empty_pwm():
    """Empty PWMs (a regrafted parent aligning zero residues) must not
    crash: scipy >= 1.17 logsumexp rejects tuple axes on empty arrays."""
    import numpy as np

    from historian_tpu.engine.treealign import calc_ins_probs

    out = calc_ins_probs(
        np.zeros((0, 1, 20)), np.zeros((1, 20)), np.zeros(1)
    )
    assert out.shape == (0,)
