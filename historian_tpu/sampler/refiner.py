"""Iterative alignment refinement by per-branch Viterbi realignment.

Counterpart of the reference's Refiner (/root/reference/src/refiner.cpp):
cycle over non-root nodes, recompute each parent-child alignment by
Viterbi over conditional position-weight matrices (device branch DP),
accept if the full history log-likelihood improves, stop after a full
unimproved cycle.
"""

from __future__ import annotations

import numpy as np

from historian_tpu.core.alignpath import Alignment, GuideAlignmentEnvelope, align_path_merge
from historian_tpu.core.seqs import FastSeq
from historian_tpu.core.tree import Tree
from historian_tpu.engine.branchmatrix import BranchMatrix
from historian_tpu.engine.treealign import (
    branch_path,
    clade_path,
    get_conditional_pwms,
    get_guide_seq_pos,
    log_likelihood,
)
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.recon import DEFAULT_MAX_DISTANCE_FROM_GUIDE
from historian_tpu.utils.logging import log_this_at

REFINER_EPSILON = 1e-3


class Refiner:
    def __init__(self, model: RateModel, max_distance_from_guide: int = DEFAULT_MAX_DISTANCE_FROM_GUIDE):
        self.model = model
        self.max_distance_from_guide = max_distance_from_guide

    def refine_node(self, tree: Tree, gapped: list[FastSeq], node: int) -> list[FastSeq]:
        """One branch-realignment attempt (refiner.cpp:10-103 + 120-165)."""
        parent = tree.parent(node)
        dist = tree.branch_length_between(parent, node)
        old_align = Alignment.from_gapped(gapped)
        old_branch_path = branch_path(old_align.path, tree, node)
        env = GuideAlignmentEnvelope(old_branch_path, parent, node, self.max_distance_from_guide)
        p_clade = clade_path(old_align.path, tree, parent, node)
        n_clade = clade_path(old_align.path, tree, node, parent)
        parent_env_pos = get_guide_seq_pos(old_align.path, parent, parent)
        node_env_pos = get_guide_seq_pos(old_align.path, node, node)

        pwms = get_conditional_pwms(
            self.model, tree, gapped, {node: parent, parent: node}
        )
        matrix = BranchMatrix(
            self.model, pwms[parent], pwms[node], dist, env,
            parent_env_pos, node_env_pos, parent, node, viterbi=True,
        )
        new_branch_path = matrix.best()
        new_path = align_path_merge([p_clade, new_branch_path, n_clade])
        new_align = Alignment(old_align.ungapped, new_path)
        return new_align.gapped()

    def refine(self, tree: Tree, gapped: list[FastSeq]) -> tuple[Tree, list[FastSeq]]:
        if not tree.is_postorder_sorted():
            raise ValueError("tree must be postorder sorted")
        best_gapped = gapped
        best_lp = log_likelihood(self.model, tree, best_gapped)
        node = 0
        steps_since_improvement = 0
        while steps_since_improvement < tree.n_nodes() - 1:
            new_gapped = self.refine_node(tree, best_gapped, node)
            new_lp = log_likelihood(self.model, tree, new_gapped)
            if new_lp > best_lp:
                log_this_at(3, f"refinement improved logLik {best_lp:.4f} -> {new_lp:.4f}")
                best_gapped = new_gapped
                best_lp = new_lp
                steps_since_improvement = 0
            else:
                if new_lp < best_lp and abs(new_lp - best_lp) > REFINER_EPSILON * max(abs(new_lp), abs(best_lp)):
                    log_this_at(1, f"warning: refinement dropped logLik {best_lp} -> {new_lp}")
                steps_since_improvement += 1
            node = (node + 1) % (tree.n_nodes() - 1)
        return tree, best_gapped
