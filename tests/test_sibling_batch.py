"""Batched sibling proposal fill vs the per-matrix fills (VERDICT r4 #4)."""

import numpy as np

from historian_tpu.core.alignpath import GuideAlignmentEnvelope
from historian_tpu.core.stockholm import Stockholm
from historian_tpu.engine.treealign import get_conditional_pwms
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.sampler.sibling import SiblingMatrix


def _mats(ref_data, defer):
    model = RateModel.from_file(f"{ref_data}/testamino.json")
    from historian_tpu.core.tree import Tree
    from historian_tpu.sampler.simulator import simulate_tree
    from historian_tpu.utils.rng import MT19937

    rng = np.random.RandomState(7)
    n_leaves = 6
    pts = np.sort(rng.uniform(0.1, 1.0, n_leaves))
    dist = np.abs(pts[:, None] - pts[None, :]) + 0.1
    np.fill_diagonal(dist, 0.0)
    tree = Tree.upgma([f"L{i}" for i in range(n_leaves)], dist)
    tree.assign_internal_node_names()
    stock = simulate_tree(MT19937(5), model, tree, 60)
    rows = tree.reorder_seqs(stock.gapped)
    out = []
    for node in range(tree.n_nodes()):
        if tree.is_leaf(node) or len(out) >= 3:
            continue
        l_child, r_child = tree.children(node)
        exclude = {l_child: node, r_child: node}
        pwms = get_conditional_pwms(model, tree, rows, exclude)
        out.append(SiblingMatrix(
            model, pwms[l_child], pwms[r_child],
            tree.branch_length(l_child), tree.branch_length(r_child),
            GuideAlignmentEnvelope(),
            np.arange(len(pwms[l_child]) + 1),
            np.arange(len(pwms[r_child]) + 1),
            l_child, r_child, node, defer_fill=defer,
        ))
    return out


def test_batch_fill_matches_single(ref_data):
    singles = _mats(ref_data, defer=False)   # host-filled at init
    batched = _mats(ref_data, defer=True)
    assert SiblingMatrix.fill_batch(batched)
    assert len(singles) == len(batched) >= 2
    # mixed grid sizes in one dispatch
    assert len({(m.x_size, m.y_size) for m in batched}) >= 2
    for s, b in zip(singles, batched):
        assert abs(s.lp_end - b.lp_end) < 1e-6, (s.lp_end, b.lp_end)
        mask = s.cells > -1e29
        np.testing.assert_allclose(
            b.cells[mask], s.cells[mask], rtol=1e-9, atol=1e-6
        )
