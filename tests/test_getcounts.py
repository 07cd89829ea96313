"""Posterior-expected count extraction (BackwardMatrix.get_counts):
batched column fills must equal the reference's per-cell walk."""

import os

import numpy as np

from historian_tpu.core.alignpath import GuideAlignmentEnvelope
from historian_tpu.core.seqs import read_fasta
from historian_tpu.core.tree import Tree
from historian_tpu.engine.forward import BackwardMatrix, ForwardMatrix
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.engine.profile import Profile
from historian_tpu.engine.sumprod import SumProductEngine
from historian_tpu.models.counts import EigenCounts
from historian_tpu.models.ratemodel import ProbModel, RateModel


def slow_get_counts(bwd: BackwardMatrix) -> EigenCounts:
    """Direct re-statement of the reference loop (forward.cpp:1183-1214).

    Faithful detail: accumulateCachedEigenCounts runs for EVERY
    in-envelope cell -- including weight-0 cells -- so the lazy x/y
    insert-column caches are populated in full (i, j, s) scan order.  A
    row whose first in-envelope cell sits on the j=0 border therefore
    caches an EMPTY column (getAlignmentColumn's range guard) and drops
    that row's insert counts, exactly as the reference does."""
    from historian_tpu.engine.pairhmm import PairHMM as P

    fwd = bwd.fwd
    counts = EigenCounts(bwd.hmm.components, bwd.hmm.alphabet_size)
    counts.indel.lp = fwd.lp_end
    for i in range(bwd.x_size - 1):
        for j in range(bwd.y_size - 1):
            if not bwd.env_mask[i, j]:
                continue
            for s in P.states():
                dest = (i, j, s)
                lp_dest = bwd.cells[i, j, s]
                w = np.exp(fwd.cells[i, j, s] + lp_dest - fwd.lp_end)
                if fwd.sumprod is not None:
                    cc = fwd.cached_cell_eigen_counts(dest)  # populates caches
                    if np.isfinite(w) and w > 0:
                        cc = cc.copy()
                        cc *= w
                        counts += cc
                for src, lp_trans in fwd.source_transitions(dest).items():
                    wt = np.exp(
                        fwd.cells[src[0], src[1], src[2]] + lp_trans + lp_dest - fwd.lp_end
                    )
                    if np.isfinite(wt) and wt > 0:
                        tc = fwd.transition_eigen_counts(src, dest)
                        tc *= wt
                        counts += tc
    return counts


def test_batched_get_counts_matches_slow(ref_data):
    model = RateModel.from_file(os.path.join(ref_data, "testcount.jukescantor.json"))
    with open(os.path.join(ref_data, "testcount.nh")) as f:
        tree = Tree(f.read())
    gapped = read_fasta(os.path.join(ref_data, "testcount.fa"))
    leaf_seqs = {s.name: s for s in gapped}

    # two-leaf subtree: seq2 vs seq3 under parent23
    node = tree.find_node("parent23")
    l_child, r_child = tree.children(node)
    sumprod = SumProductEngine(model, tree)
    lp = ProbModel(model, tree.branch_length(l_child))
    rp = ProbModel(model, tree.branch_length(r_child))
    hmm = PairHMM(lp, rp, model.ins_prob)
    x = Profile.from_sequence(
        model.components, model.alphabet, leaf_seqs[tree.node_name(l_child)].ungapped(), l_child
    )
    y = Profile.from_sequence(
        model.components, model.alphabet, leaf_seqs[tree.node_name(r_child)].ungapped(), r_child
    )
    fwd = ForwardMatrix(x, y, hmm, node, GuideAlignmentEnvelope(), sumprod)
    bwd = BackwardMatrix(fwd)

    fast = bwd.get_counts()
    fwd.x_insert_counts.clear()
    fwd.y_insert_counts.clear()
    fwd._cell_counts.clear()
    slow = slow_get_counts(bwd)

    np.testing.assert_allclose(fast.root_count, slow.root_count, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(fast.eigen_count, slow.eigen_count, rtol=1e-9, atol=1e-12)
    for attr in ["ins", "del_", "ins_ext", "del_ext", "ins_time", "del_time", "lp"]:
        assert abs(getattr(fast.indel, attr) - getattr(slow.indel, attr)) < 1e-9, attr


def test_batched_get_counts_matches_slow_guided(ref_data):
    """Same oracle under a guide envelope: interior rows/columns then
    cache REAL insert columns (j_first > 0), exercising the non-border
    representative path."""
    model = RateModel.from_file(os.path.join(ref_data, "testcount.jukescantor.json"))
    with open(os.path.join(ref_data, "testcount.nh")) as f:
        tree = Tree(f.read())
    gapped = read_fasta(os.path.join(ref_data, "testcount.fa"))
    leaf_seqs = {s.name: s for s in gapped}

    node = tree.find_node("parent23")
    l_child, r_child = tree.children(node)
    sumprod = SumProductEngine(model, tree)
    lp = ProbModel(model, tree.branch_length(l_child))
    rp = ProbModel(model, tree.branch_length(r_child))
    hmm = PairHMM(lp, rp, model.ins_prob)
    x = Profile.from_sequence(
        model.components, model.alphabet, leaf_seqs[tree.node_name(l_child)].ungapped(), l_child
    )
    y = Profile.from_sequence(
        model.components, model.alphabet, leaf_seqs[tree.node_name(r_child)].ungapped(), r_child
    )
    guide = {
        l_child: np.array([c != "-" for c in leaf_seqs[tree.node_name(l_child)].seq]),
        r_child: np.array([c != "-" for c in leaf_seqs[tree.node_name(r_child)].seq]),
    }
    env = GuideAlignmentEnvelope(guide, l_child, r_child, 1)
    fwd = ForwardMatrix(x, y, hmm, node, env, sumprod)
    assert fwd.lp_end > -np.inf
    bwd = BackwardMatrix(fwd)
    # the envelope must actually exclude some border cells for this test
    # to exercise interior representatives
    assert not bwd.env_mask.all()

    fast = bwd.get_counts()
    fwd.x_insert_counts.clear()
    fwd.y_insert_counts.clear()
    fwd._cell_counts.clear()
    slow = slow_get_counts(bwd)

    np.testing.assert_allclose(fast.root_count, slow.root_count, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(fast.eigen_count, slow.eigen_count, rtol=1e-9, atol=1e-12)
    for attr in ["ins", "del_", "ins_ext", "del_ext", "ins_time", "del_time", "lp"]:
        assert abs(getattr(fast.indel, attr) - getattr(slow.indel, attr)) < 1e-9, attr
