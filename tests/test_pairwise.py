"""Pairwise-kernel tests: quickalign, distances, NJ/UPGMA trees, guide graph.

Golden parity with the reference's testquickalign / testnj / testupgma
harnesses (reference Makefile:267-279) on the same data.
"""

import os

import numpy as np
import pytest

from historian_tpu.core.alignpath import Alignment
from historian_tpu.core.seqs import format_fasta, read_fasta
from historian_tpu.core.tree import Tree
from historian_tpu.engine.diagenv import DiagEnvParams, DiagonalEnvelope
from historian_tpu.engine.quickalign import QuickAligner
from historian_tpu.engine.span import AlignGraph
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.ops.distance import batched_ml_distances

from .golden import assert_text_match


def data(ref_data, name):
    return os.path.join(ref_data, name)


def test_quickalign_golden(ref_data):
    """PF16593 pair with testamino.json at t=1 -> golden alignment."""
    seqs = read_fasta(data(ref_data, "PF16593.pair.fa"))
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    aligner = QuickAligner(model, 1.0)
    result = aligner.align(seqs[0], seqs[1])
    gapped = result.gapped()
    with open(data(ref_data, "testquickalign.out.fa")) as f:
        assert format_fasta(gapped) == f.read()


def test_quickalign_envelope_consistency(ref_data):
    """A k-mer-seeded envelope around a strong diagonal reproduces the
    full-DP result (identical sequences seed diagonal 0 heavily)."""
    seqs = read_fasta(data(ref_data, "PF16593.pair.fa"))
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    aligner = QuickAligner(model, 1.0)
    x = seqs[0]
    full = aligner.align(x, x)
    env = DiagonalEnvelope(len(x.seq), len(x.seq))
    env.init_sparse(
        model.alphabet.tokenize(x.seq),
        model.alphabet.tokenize(x.seq),
        model.alphabet_size,
        DiagEnvParams(kmer_len=5, kmer_threshold=1, band_size=16),
    )
    assert len(env.diagonals) < 2 * len(x.seq) - 1  # actually sparse
    banded = aligner.align(x, x, env)
    assert abs(full.result - banded.result) < 1e-6


def test_quickalign_no_kmer_hits_degrades_gracefully(ref_data):
    """With no k-mer matches the sparse envelope collapses to diagonal 0
    (reference always seeds diagonal 0) and still yields a valid path."""
    seqs = read_fasta(data(ref_data, "PF16593.pair.fa"))
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    aligner = QuickAligner(model, 1.0)
    env = DiagonalEnvelope(len(seqs[0].seq), len(seqs[1].seq))
    env.init_sparse(
        model.alphabet.tokenize(seqs[0].seq),
        model.alphabet.tokenize(seqs[1].seq),
        model.alphabet_size,
        DiagEnvParams(kmer_len=5, kmer_threshold=1, band_size=16),
    )
    banded = aligner.align(seqs[0], seqs[1], env)
    path = banded.align_path()
    assert int(path[0].sum()) == len(seqs[0].seq)
    assert int(path[1].sum()) == len(seqs[1].seq)


def test_quickalign_identical_seqs(ref_data):
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    seqs = read_fasta(data(ref_data, "PF16593.pair.fa"))
    aligner = QuickAligner(model, 1.0)
    r = aligner.align(seqs[0], seqs[0])
    path = r.align_path()
    # identical sequences align residue-to-residue with no gaps
    assert np.all(path[0]) and np.all(path[1])


def test_nj_golden(ref_data):
    """distanceMatrix + NJ on testnj.fa must match testnj.out.nh."""
    model = RateModel.from_file(data(ref_data, "testnj.jukescantor.json"))
    gapped = read_fasta(data(ref_data, "testnj.fa"))
    dist = model.distance_matrix(gapped, use_device=False)
    tree = Tree.neighbor_joining([s.name for s in gapped], dist)
    with open(data(ref_data, "testnj.out.nh")) as f:
        assert_text_match(tree.to_string() + "\n", f.read(), sig_figs=4)


def test_upgma_golden(ref_data):
    model = RateModel.from_file(data(ref_data, "testnj.jukescantor.json"))
    gapped = read_fasta(data(ref_data, "testnj.fa"))
    dist = model.distance_matrix(gapped, use_device=False)
    tree = Tree.upgma([s.name for s in gapped], dist)
    with open(data(ref_data, "testupgma.out.nh")) as f:
        assert_text_match(tree.to_string() + "\n", f.read(), sig_figs=4)


def test_batched_distances_match_host(ref_data):
    """Device grid+golden solver agrees with the host GSL-replica path."""
    model = RateModel.from_file(data(ref_data, "testnj.jukescantor.json"))
    gapped = read_fasta(data(ref_data, "testnj.fa"))
    host = model.distance_matrix(gapped, use_device=False)
    device = batched_ml_distances(model, gapped)
    np.testing.assert_allclose(device, host, rtol=2e-2, atol=1e-4)


@pytest.mark.slow
def test_nj_amino_golden(ref_data):
    """Protein case: PF16593.testspan.fa -> PF16593.testspan.testnj.nh."""
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    gapped = read_fasta(data(ref_data, "PF16593.testspan.fa"))
    dist = model.distance_matrix(gapped, use_device=False)
    tree = Tree.neighbor_joining([s.name for s in gapped], dist)
    with open(data(ref_data, "PF16593.testspan.testnj.nh")) as f:
        assert_text_match(tree.to_string() + "\n", f.read(), sig_figs=3)


def test_guide_alignment_dense(ref_data):
    """Dense guide graph on a small protein set produces a flush MSA
    containing every sequence (testspan analogue; the reference skips its
    own testspan in CI for platform-dependent FP behavior)."""
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    seqs = read_fasta(data(ref_data, "PF16593.fa"))[:8]
    graph = AlignGraph(seqs, model, 1.0, dense=True)
    gapped = graph.mst_gapped()
    assert len(gapped) == len(seqs)
    cols = {len(s.seq) for s in gapped}
    assert len(cols) == 1
    # ungapping recovers the originals
    align = Alignment.from_gapped(gapped)
    for orig, ug in zip(seqs, align.ungapped):
        assert ug.seq.upper() == orig.seq.upper()


def test_diag_band_fill_matches_dense(ref_data):
    """The opt-in diagonal-band Viterbi fill agrees with the dense fill
    to f64 round-off on a sparse envelope (bitwise parity is not
    guaranteed: XLA may contract the delete chain differently)."""
    import jax.numpy as jnp

    from historian_tpu.engine.diagenv import DiagEnvParams, DiagonalEnvelope
    from historian_tpu.engine.quickalign import QuickAligner, QuickAlignResult
    from historian_tpu.models.ratemodel import RateModel
    from historian_tpu.ops.pairdp import banded_viterbi_fill

    model = RateModel.from_file(f"{ref_data}/testamino.json")
    seqs = read_fasta(f"{ref_data}/PF16593.pair.fa")
    x, y = seqs[0], seqs[1]
    aligner = QuickAligner(model, 1.0)
    env = DiagonalEnvelope(len(x.seq), len(y.seq))
    env.init_sparse(
        model.alphabet.tokenize(x.seq), model.alphabet.tokenize(y.seq),
        model.alphabet_size, DiagEnvParams(kmer_threshold=1, sparse=True),
    )
    r1 = QuickAlignResult(aligner, x, y, env, defer_fill=True)
    assert r1._run_fill_diag(), "diag path should engage for a sparse envelope"
    r2 = QuickAlignResult(aligner, x, y, env, defer_fill=True)
    mats, inss, dels = banded_viterbi_fill(
        jnp.asarray(r2._emit_p), jnp.asarray(r2._mask_p),
        jnp.asarray(r2._start_p), jnp.asarray(r2._trans),
    )
    r2._finish(np.asarray(mats), np.asarray(inss), np.asarray(dels))
    for a, b in ((r1.mat, r2.mat), (r1.ins, r2.ins), (r1.del_, r2.del_)):
        fin = (a > -1e29) & (b > -1e29)
        np.testing.assert_allclose(a[fin], b[fin], rtol=1e-12, atol=1e-12)
        assert np.array_equal(a > -1e29, b > -1e29)
    assert abs(r1.end - r2.end) < 1e-9


def test_align_batch_matches_sequential(ref_data):
    """The vmapped per-bucket batch fill produces the same alignments and
    scores as per-pair fills."""
    from historian_tpu.core.seqs import FastSeq
    from historian_tpu.engine.quickalign import QuickAligner
    from historian_tpu.models.ratemodel import RateModel

    model = RateModel.from_file(f"{ref_data}/testamino.json")
    seqs = read_fasta(f"{ref_data}/PF16593.fa")
    for s in seqs:
        s.seq = s.seq.replace("-", "").replace(".", "").upper()
    aligner = QuickAligner(model, 1.0)
    jobs = [(seqs[i], seqs[i + 1], None) for i in range(6)]
    batched = aligner.align_batch(jobs, force_batch=True)
    for (x, y, env), rb in zip(jobs, batched):
        rs = aligner.align(x, y, env)
        assert rb.end == rs.end and rb.x_end == rs.x_end and rb.y_end == rs.y_end
        pb, ps = rb.align_path(), rs.align_path()
        for k in pb:
            np.testing.assert_array_equal(np.asarray(pb[k]), np.asarray(ps[k]))


def test_quickalign_matches_exhaustive_max_path(ref_data):
    """Independent oracle for the guide Viterbi: enumerate every start
    cell, M/I/D path, and end cell with free end gaps; the best total
    must equal the DP's end score."""
    from historian_tpu.core.seqs import FastSeq
    from historian_tpu.engine.quickalign import QuickAligner
    from historian_tpu.models.ratemodel import RateModel

    model = RateModel.from_file(f"{ref_data}/testamino.json")
    aligner = QuickAligner(model, 1.0)
    rng = np.random.RandomState(5)
    alpha = model.alphabet.symbols
    for case in range(6):
        nx, ny = rng.randint(1, 5, size=2)
        x = "".join(rng.choice(list(alpha[:20]), nx))
        y = "".join(rng.choice(list(alpha[:20]), ny))
        r = aligner.align(FastSeq(name="x", seq=x), FastSeq(name="y", seq=y))
        al = aligner
        X, Y = nx, ny
        sg = lambda p: al.no_gap if p == 1 else al.gap_open + (p - 2) * al.gap_extend
        eg_i = lambda i: al.no_gap if i == X else al.gap_open + (X - i - 2) * al.gap_extend
        eg_j = lambda j: al.no_gap if j == Y else al.gap_open + (Y - j - 2) * al.gap_extend
        emit = r.emit  # [X+1, Y+1]
        M, I, D = 0, 1, 2
        trans = {
            (M, M): al.m2m, (M, I): al.m2i, (M, D): al.m2d,
            (I, I): al.i2i, (I, M): al.i2m, (I, D): al.i2d,
            (D, D): al.d2d, (D, M): al.d2m,
        }
        best = [-np.inf]

        def dfs(i, j, state, score):
            if state == M:
                best[0] = max(best[0], score + eg_i(i) + eg_j(j))
            for nxt in (M, I, D):
                lp = trans.get((state, nxt))
                if lp is None:
                    continue
                if nxt == M and i < X and j < Y:
                    dfs(i + 1, j + 1, nxt, score + lp + emit[i + 1, j + 1])
                elif nxt == I and j < Y:
                    dfs(i, j + 1, nxt, score + lp)
                elif nxt == D and i < X:
                    dfs(i + 1, j, nxt, score + lp)

        for i0 in range(1, X + 1):
            for j0 in range(1, Y + 1):
                dfs(i0, j0, M, sg(i0) + sg(j0) + emit[i0, j0])
        assert abs(r.end - best[0]) < 1e-9, (case, x, y, r.end, best[0])


@pytest.mark.slow
def test_upgma_amino_golden(ref_data):
    """Protein UPGMA case (reference Makefile:276): PF16593.testspan.fa
    under the amino model -> PF16593.testspan.testupgma.nh."""
    model = RateModel.from_file(data(ref_data, "testamino.json"))
    gapped = read_fasta(data(ref_data, "PF16593.testspan.fa"))
    dist = model.distance_matrix(gapped, use_device=False)
    tree = Tree.upgma([s.name for s in gapped], dist)
    with open(data(ref_data, "PF16593.testspan.testupgma.nh")) as f:
        assert_text_match(tree.to_string() + "\n", f.read(), sig_figs=3)
