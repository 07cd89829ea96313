"""Foundation-layer tests: sequences, alignment paths, trees.

Golden-parity targets mirror the reference's testseqio / testmerge /
testtreeio harnesses (reference Makefile:210-237, 259-265) using the same
data files.
"""

import os

import numpy as np
import pytest

from historian_tpu.core.alignpath import (
    Alignment,
    GuideAlignmentEnvelope,
    align_path_columns,
    align_path_concat,
    align_path_merge,
    align_path_remove_empty_columns,
)
from historian_tpu.core.seqs import FastSeq, format_fasta, parse_fasta, read_fasta
from historian_tpu.core.tree import Tree
from historian_tpu.utils.rng import MT19937


def data(ref_data, name):
    return os.path.join(ref_data, name)


# ----------------------------------------------------------------- FASTA IO
def test_fasta_roundtrip(ref_data):
    for fn in ["testaligncount.fa", "gp120.fa"]:
        path = data(ref_data, fn)
        seqs = read_fasta(path)
        with open(path) as f:
            original = f.read()
        assert format_fasta(seqs) == original


def test_fasta_parse_comment():
    seqs = parse_fasta(">a hello world\nACGT\nAC\n>b\n\n")
    assert seqs[0].name == "a"
    assert seqs[0].comment == "hello world"
    assert seqs[0].seq == "ACGTAC"
    assert seqs[1].name == "b"
    assert seqs[1].seq == ""


# ------------------------------------------------------------ alignpath merge
def merge_files(ref_data, *names):
    """Reimplementation of the reference testmerge harness (t/testmerge.cpp)."""
    name_to_row = {}
    ungapped = []
    paths = []
    for fn in names:
        gapped = read_fasta(data(ref_data, fn))
        align = Alignment.from_gapped(gapped)
        path = {}
        for n, g in enumerate(gapped):
            if g.name not in name_to_row:
                name_to_row[g.name] = len(ungapped)
                ungapped.append(align.ungapped[n])
            path[name_to_row[g.name]] = align.path[n]
        paths.append(path)
    merged = align_path_merge(paths)
    return format_fasta(Alignment(ungapped, merged).gapped())


@pytest.mark.parametrize(
    "inputs,expected",
    [
        (("testmerge1.xy.fa", "testmerge1.xz.fa"), "testmerge1.xyz.fa"),
        (("testmerge1.xy.fa", "testmerge1.ayz.fa"), "testmerge1.xyaz.fa"),
        (("testmerge1.xz.fa", "testmerge1.ayz.fa"), "testmerge1.xzay.fa"),
        (("testmerge1.axyz.fa", "testmerge1.xz.fa"), "testmerge1.axyz.fa"),
    ],
)
def test_align_path_merge_golden(ref_data, inputs, expected):
    got = merge_files(ref_data, *inputs)
    with open(data(ref_data, expected)) as f:
        assert got == f.read()


@pytest.mark.parametrize(
    "inputs",
    [
        ("testmerge1.xy.fa", "testmerge1.xz.fa", "testmerge1-fail.ayz.fa"),
        ("testmerge2.1.fa", "testmerge2.2.fa", "testmerge2.3.fa"),
    ],
)
def test_align_path_merge_inconsistent_fails(ref_data, inputs):
    with pytest.raises(ValueError):
        merge_files(ref_data, *inputs)


def test_align_path_concat_and_trim():
    p1 = {0: np.array([True, False]), 1: np.array([True, True])}
    p2 = {1: np.array([True]), 2: np.array([True])}
    cat = align_path_concat(p1, p2)
    assert align_path_columns(cat) == 3
    assert list(cat[0]) == [True, False, False]
    assert list(cat[2]) == [False, False, True]
    trimmed = align_path_remove_empty_columns(
        {0: np.array([True, False, False]), 1: np.array([True, False, True])}
    )
    assert align_path_columns(trimmed) == 2


def test_guide_envelope():
    # two identical rows: cumulative match offset always 0
    guide = {0: np.ones(5, dtype=bool), 1: np.ones(5, dtype=bool)}
    env = GuideAlignmentEnvelope(guide, 0, 1, 0)
    assert env.in_range(0, 0) and env.in_range(3, 3)
    assert not env.in_range(0, 3)
    mat = env.in_range_matrix(6, 6)
    assert mat[2, 2] and not mat[0, 4]


# ---------------------------------------------------------------------- tree
def test_tree_roundtrip(ref_data):
    for fn in ["PF16593.nhx", "testnj.out.nh", "PF16593.testspan.testnj.nh", "testtreenobranchlen.nh"]:
        with open(data(ref_data, fn)) as f:
            original = f.read().strip()
        t = Tree(original)
        assert t.to_string() == original


def test_tree_duplicate_name_fails(ref_data):
    with open(data(ref_data, "testtreedupname.nh")) as f:
        s = f.read()
    with pytest.raises(ValueError):
        Tree(s)


def test_tree_reroot_golden(ref_data):
    with open(data(ref_data, "testreroot.nh")) as f:
        t = Tree(f.read())
    rerooted = t.reroot_above("C")
    with open(data(ref_data, "testreroot.c.nh")) as f:
        assert rerooted.to_string() == f.read().strip()


def test_tree_postorder_invariants(ref_data):
    with open(data(ref_data, "PF16593.testspan.testnj.nh")) as f:
        t = Tree(f.read())
    assert t.is_postorder_sorted()
    assert t.is_binary()
    post = t.postorder()
    seen = set()
    for n in post:
        for c in t.children(n):
            assert c in seen
        seen.add(n)
    # parent pointers consistent
    for n in range(t.n_nodes() - 1):
        assert n in t.children(t.parent(n))


def test_tree_closest_leaf():
    t = Tree("((A:1,B:2)ab:1,(C:5,D:4)cd:1)r;")
    assert t.node_name(t.closest_leaf(t.find_node("ab"))) == "A"
    # unrooted search from cd reaches A at distance 3 (< D at 4)
    assert t.node_name(t.closest_leaf(t.find_node("cd"))) == "A"
    # restricted below cd (parent=root), D at 4 wins
    assert t.node_name(t.closest_leaf(t.find_node("cd"), t.root())) == "D"
    assert t.node_name(t.closest_leaf(t.root())) == "A"


def test_upgma_ultrametric():
    d = np.array(
        [
            [0.0, 2.0, 6.0, 6.0],
            [2.0, 0.0, 6.0, 6.0],
            [6.0, 6.0, 0.0, 4.0],
            [6.0, 6.0, 4.0, 0.0],
        ]
    )
    t = Tree.upgma(["a", "b", "c", "d"], d)
    assert t.is_ultrametric()
    assert t.is_binary()


def test_nj_recovers_additive_tree():
    # additive distances from tree ((A:1,B:2):1,(C:3,D:4):1);
    d = np.array(
        [
            [0.0, 3.0, 6.0, 7.0],
            [3.0, 0.0, 7.0, 8.0],
            [6.0, 7.0, 0.0, 7.0],
            [7.0, 8.0, 7.0, 0.0],
        ]
    )
    t = Tree.neighbor_joining(["A", "B", "C", "D"], d)
    assert t.is_binary()
    # A and B should be siblings; C and D should be siblings
    a, b = t.find_node("A"), t.find_node("B")
    c, dd = t.find_node("C"), t.find_node("D")
    assert t.parent(a) == t.parent(b)
    assert t.parent(c) == t.parent(dd)
    # branch lengths recovered (A:1, B:2)
    assert abs(t.branch_length(a) - 1.0) < 1e-9
    assert abs(t.branch_length(b) - 2.0) < 1e-9


# ----------------------------------------------------------------------- RNG
def test_mt19937_reference_vector():
    # std::mt19937 seeded with 5489: 10000th draw is 4123659995
    g = MT19937(5489)
    for _ in range(9999):
        g.next_u32()
    assert g.next_u32() == 4123659995


def test_mt19937_uniform_range():
    g = MT19937(42)
    xs = [g.uniform(0, 10) for _ in range(1000)]
    assert all(0 <= x < 10 for x in xs)
    assert 4 < sum(xs) / len(xs) < 6


def test_fuzz_alignpath_merge_roundtrip(ref_data):
    """Seeded fuzz: splitting a random multi-row alignment into
    overlapping pairwise projections and re-merging reproduces it."""
    from historian_tpu.core.alignpath import (
        align_path_merge, align_path_remove_empty_columns,
    )

    rng = np.random.RandomState(11)
    for case in range(10):
        n_rows = rng.randint(3, 7)
        n_cols = rng.randint(4, 14)
        while True:
            # each column's rows form a contiguous run, so the chain of
            # adjacent-row projections links every column transitively
            # (columns with disconnected row sets legitimately split)
            cols = []
            for _ in range(n_cols):
                lo = rng.randint(0, n_rows)
                hi = rng.randint(lo, n_rows)
                col = np.zeros(n_rows, dtype=bool)
                col[lo : hi + 1] = True
                cols.append(col)
            grid = np.stack(cols, axis=1)  # [rows, cols]
            path = {r: grid[r] for r in range(n_rows)}
            if all(p.any() for p in path.values()):
                break
        # overlapping chain of pairwise projections covers all rows
        parts = []
        for r in range(n_rows - 1):
            sub = {r: path[r], r + 1: path[r + 1]}
            keep = np.array([sub[r][c] or sub[r + 1][c] for c in range(n_cols)])
            parts.append({k: v[keep] for k, v in sub.items()})
        merged = align_path_merge(parts)
        clean = align_path_remove_empty_columns(path)
        assert set(merged) == set(clean)
        for r in merged:
            assert int(np.sum(merged[r])) == int(np.sum(clean[r]))
        # the merge guarantees (a) each INPUT pairwise alignment is
        # reproduced and (b) residue co-occupancy (which residues share a
        # column) is transitively preserved; unconstrained gap-only
        # column interleavings may permute
        def projection(p, a, b):
            return [
                (bool(p[a][c]), bool(p[b][c]))
                for c in range(len(p[a]))
                if p[a][c] or p[b][c]
            ]

        for a in range(n_rows - 1):
            assert projection(merged, a, a + 1) == projection(clean, a, a + 1), (case, a)

        def pairings(p, a, b):
            out = set()
            pa = np.cumsum(np.asarray(p[a])) - 1
            pb = np.cumsum(np.asarray(p[b])) - 1
            for c in range(len(p[a])):
                if p[a][c] and p[b][c]:
                    out.add((int(pa[c]), int(pb[c])))
            return out

        for a in range(n_rows):
            for b in range(a + 1, n_rows):
                assert pairings(merged, a, b) == pairings(clean, a, b), (case, a, b)
