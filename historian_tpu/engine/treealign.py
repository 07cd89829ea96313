"""Tree+alignment likelihood decomposition and alignment-path surgery.

Counterpart of the reference's TreeAlignFuncs (/root/reference/src/sampler.h:18-211,
sampler.cpp:136-448): the full history log-likelihood decomposes as

  logLik = [tree prior] + root geometric length + sum_branches indel path
           + sum_columns substitution likelihood

with the substitution term computed by the batched sum-product engine
(one device fill over all columns).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from historian_tpu.core.alignpath import AlignPath, Alignment, align_path_columns
from historian_tpu.core.seqs import FastSeq
from historian_tpu.core.tree import Tree
from historian_tpu.engine.sumprod import SumProductEngine, get_engine
from historian_tpu.models.ratemodel import ProbModel, RateModel


@dataclass
class History:
    gapped: list[FastSeq]
    tree: Tree


def root_ext_prob(model: RateModel) -> float:
    return model.ins_ext_prob


def pair_path(path: AlignPath, node1: int, node2: int) -> AlignPath:
    """Canonical-order 2-row subpath: deletions deferred past inserts
    (sampler.cpp:150-189).

    Vectorized: within each inter-match segment the canonical order is
    inserts (in input order), then deferred deletions, then the closing
    match -- a stable sort by (segment, kind)."""
    row1 = np.asarray(path[node1], dtype=bool)
    row2 = np.asarray(path[node2], dtype=bool)
    keep = row1 | row2
    c1 = row1[keep]
    c2 = row2[keep]
    is_match = c1 & c2
    is_del = c1 & ~c2
    # segment = number of matches strictly before this column
    seg = np.cumsum(is_match) - is_match
    kind = np.where(is_match, 2, np.where(is_del, 1, 0))
    order = np.lexsort((np.arange(len(c1)), kind, seg))
    return {node1: c1[order], node2: c2[order]}


def branch_path_states(prow: np.ndarray, crow: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(src_states, dst_states) for the 2-row transition walk -- depends
    only on the gap patterns, not the branch length."""
    keep = prow | crow
    c1 = prow[keep]
    c2 = crow[keep]
    states = np.where(c1 & c2, ProbModel.MATCH, np.where(c1, ProbModel.DELETE, ProbModel.INSERT))
    src_states = np.concatenate([[ProbModel.MATCH], states])
    dst_states = np.concatenate([states, [ProbModel.END]])
    return src_states, dst_states


def log_branch_path_likelihood(prob_model: ProbModel, path: AlignPath, parent: int, child: int) -> float:
    """Transition-probability walk over a 2-row path (sampler.cpp:439-450).

    Vectorized with the float semantics of the sequential walk: log
    table entries come from math.log and the left-fold accumulation
    order is preserved via cumsum."""
    src_states, dst_states = branch_path_states(
        np.asarray(path[parent], dtype=bool), np.asarray(path[child], dtype=bool)
    )
    return _log_path_states_likelihood(prob_model, src_states, dst_states)


def _log_path_states_likelihood(prob_model: ProbModel, src_states, dst_states) -> float:
    log_t = _log_trans_table(prob_model)
    terms = log_t[src_states, dst_states]
    if len(terms) == 0:
        return 0.0
    return float(np.cumsum(terms)[-1])


def _log_trans_table(prob_model: ProbModel) -> np.ndarray:
    table = getattr(prob_model, "_log_trans_table", None)
    if table is None:
        n = max(ProbModel.MATCH, ProbModel.INSERT, ProbModel.DELETE, ProbModel.END) + 1
        table = np.full((n, n), -np.inf)
        for s in (ProbModel.MATCH, ProbModel.INSERT, ProbModel.DELETE):
            for d in (ProbModel.MATCH, ProbModel.INSERT, ProbModel.DELETE, ProbModel.END):
                p = prob_model.trans_prob(s, d)
                table[s, d] = math.log(p) if p > 0 else -np.inf
        prob_model._log_trans_table = table
    return table


def root_log_likelihood(model: RateModel, history: History) -> float:
    root_len = sum(
        1 for c in history.gapped[history.tree.root()].seq if c not in "-."
    )
    ext = root_ext_prob(model)
    return math.log(1 - ext) + math.log(ext) * root_len if ext > 0 else (
        math.log(1 - ext) if root_len == 0 else -math.inf
    )


_INDEL_LP_CACHE: dict = {}
_INDEL_LP_CACHE_MAX = 200_000
_PAIR_STATES_CACHE: dict = {}
_PAIR_STATES_CACHE_MAX = 50_000


def indel_log_likelihood(model: RateModel, history: History) -> float:
    align = Alignment.from_gapped(history.gapped)
    lp = 0.0
    # Two memo levels, both preserving the walk's float semantics exactly:
    # per-branch terms by (indel params, branch length, the two rows' gap
    # patterns) -- alignment moves change a handful of branches; and the
    # canonical-order state sequences by gap patterns alone -- tree moves
    # (NodeHeight/Rescale) change every t but no paths, leaving only a
    # table gather + cumsum per branch.
    params = (model.ins_rate, model.del_rate, model.ins_ext_prob, model.del_ext_prob)
    for node in range(history.tree.root()):
        parent = history.tree.parent(node)
        t = history.tree.branch_length(node)
        rows_key = (
            np.asarray(align.path[parent], dtype=bool).tobytes(),
            np.asarray(align.path[node], dtype=bool).tobytes(),
        )
        key = (params, t, rows_key)
        hit = _INDEL_LP_CACHE.get(key)
        if hit is None:
            st = _PAIR_STATES_CACHE.get(rows_key)
            if st is None:
                path = pair_path(align.path, parent, node)
                st = branch_path_states(
                    np.asarray(path[parent], dtype=bool),
                    np.asarray(path[node], dtype=bool),
                )
                if len(_PAIR_STATES_CACHE) >= _PAIR_STATES_CACHE_MAX:
                    _PAIR_STATES_CACHE.clear()
                _PAIR_STATES_CACHE[rows_key] = st
            pm = ProbModel(model, t)
            hit = _log_path_states_likelihood(pm, *st)
            if len(_INDEL_LP_CACHE) >= _INDEL_LP_CACHE_MAX:
                _INDEL_LP_CACHE.clear()
            _INDEL_LP_CACHE[key] = hit
        lp += hit
    return lp


def subst_log_likelihood(model: RateModel, history: History) -> float:
    engine = get_engine(model, history.tree)
    return engine.log_likelihood_cached([s.seq for s in history.gapped])


def log_likelihood(model: RateModel, tree: Tree, gapped: list[FastSeq]) -> float:
    history = History(gapped=gapped, tree=tree)
    return (
        root_log_likelihood(model, history)
        + indel_log_likelihood(model, history)
        + subst_log_likelihood(model, history)
    )


def clade_path(path: AlignPath, tree: Tree, clade_root: int, clade_root_parent: int, exclude: int = -1) -> AlignPath:
    """Sub-path of rows in the clade rooted at clade_root (viewed from
    clade_root_parent), empty columns removed (sampler.cpp:136-148)."""
    from historian_tpu.core.alignpath import align_path_remove_empty_columns

    rerooted_parent = tree.rerooted_parent(clade_root_parent)
    children_included = [False] * tree.n_nodes()
    children_included[clade_root_parent] = True
    p: AlignPath = {}
    for n in tree.rerooted_preorder(clade_root, clade_root_parent):
        if n != exclude and children_included[rerooted_parent[n]]:
            p[n] = path[n]
            children_included[n] = True
    return align_path_remove_empty_columns(p)


def branch_path(path: AlignPath, tree: Tree, node: int) -> AlignPath:
    parent = tree.parent(node)
    if parent < 0:
        raise ValueError("parent node not found")
    return pair_path(path, parent, node)


def get_guide_seq_pos(path: AlignPath, row: int, guide_row: int) -> np.ndarray:
    """guidePos[i] = #guide-row residues before/at the i-th residue of row
    (sampler.cpp:118-133): maps sequence positions onto envelope coords."""
    rowp = np.asarray(path[row], dtype=bool)
    guidep = np.asarray(path[guide_row], dtype=bool)
    cum = np.cumsum(guidep)
    return np.concatenate([[0], cum[rowp]]).astype(np.int64)


# PosWeightMatrix: [L, C, A] log-probability tensor, one row per residue.

def get_conditional_pwms(model: RateModel, tree: Tree, gapped: list[FastSeq], exclude: dict[int, int], normalize: bool = True) -> dict[int, np.ndarray]:
    """Per-column conditional log-posteriors of each node's residue
    excluding one neighbor's message (reference getConditionalPWMs,
    sampler.cpp:356-370).

    The reference restricts its per-column traversals purely to skip
    computing messages it won't read; a full batched fill yields
    identical E/G messages, so here one device fill serves all columns.
    """
    engine = get_engine(model, tree)
    fill = engine.fill_cached([s.seq for s in gapped])
    arr = engine.arrays
    c_, a_ = model.components, model.alphabet_size
    out: dict[int, np.ndarray] = {}
    for node, excl in exclude.items():
        row = gapped[node].seq
        cols = np.array([c for c in range(fill.n_columns) if row[c] not in "-."], dtype=np.int64)
        if len(cols) == 0:
            out[node] = np.zeros((0, c_, a_))
            continue
        # batched log_node_excluded_post_prob over this node's columns,
        # term order identical to the per-column version
        toks = fill.tokens[node, cols]
        init = np.where(
            (toks >= 0)[:, None],
            np.where(np.arange(a_)[None, :] == toks[:, None], 0.0, -np.inf),
            0.0,
        )
        lpp = np.tile(init[:, None, :], (1, c_, 1))
        lpp += engine.log_cpt_weight[None, :, None]
        with np.errstate(divide="ignore"):
            for child in (arr.left[node], arr.right[node]):
                if child >= 0 and child != excl:
                    lpp += (
                        np.log(fill.rows_at("E", cols, child))
                        + fill.rows_at("logE", cols, child)[:, :, None]
                    )
            p = arr.parent[node]
            if p != excl and p >= 0:
                lpp += (
                    np.log(fill.rows_at("G", cols, node))
                    + fill.rows_at("logG", cols, node)[:, :, None]
                )
        if normalize:
            from scipy.special import logsumexp

            lpp -= logsumexp(lpp, axis=(1, 2), keepdims=True)
        out[node] = lpp
    return out


def pre_multiply(child_pwm: np.ndarray, log_sub_prob: np.ndarray) -> np.ndarray:
    """pwm'[l, c, i] = lse_j(logSubProb[c, i, j] + pwm[l, c, j])
    (sampler.cpp:452-464), vectorized."""
    mx = child_pwm.max(axis=2, keepdims=True)
    safe = np.where(np.isfinite(mx), mx, 0.0)
    p = np.exp(child_pwm - safe)
    with np.errstate(divide="ignore"):
        return np.log(np.einsum("cij,lcj->lci", np.exp(log_sub_prob), p)) + safe


def calc_ins_probs(child_pwm: np.ndarray, log_ins_prob: np.ndarray, log_cpt_weight: np.ndarray) -> np.ndarray:
    """ins[l] = lse_{c,i}(log w_c + log insProb[c,i] + pwm[l,c,i])."""
    from scipy.special import logsumexp

    if len(child_pwm) == 0:
        # empty PWM (e.g. a regrafted parent that aligned no residues);
        # scipy >= 1.17 logsumexp rejects tuple axes on empty arrays
        return np.zeros(0)
    return logsumexp(
        child_pwm + log_ins_prob[None, :, :] + log_cpt_weight[None, :, None], axis=(1, 2)
    )


class SimpleTreePrior:
    """Coalescent prior with rate C(k,2)/N (sampler.cpp:9-31)."""

    def __init__(self, population_size: float = 1.0):
        self.population_size = population_size

    def tree_log_likelihood(self, tree: Tree) -> float:
        # times between coalescences under the coalescent with k lineages
        heights = tree.distance_from_root()
        max_h = heights.max()
        node_times = sorted(
            (max_h - heights[n]) for n in range(tree.n_nodes()) if not tree.is_leaf(n)
        )
        n_leaves = sum(1 for n in range(tree.n_nodes()) if tree.is_leaf(n))
        lp = 0.0
        k = n_leaves
        last_t = 0.0
        for t in node_times:
            rate = k * (k - 1) / 2 / self.population_size
            dt = max(0.0, t - last_t)
            lp += math.log(rate) - rate * dt
            k -= 1
            last_t = t
        return lp
