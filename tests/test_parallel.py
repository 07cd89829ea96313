"""Multi-chip scaling validation: shard-count invariance and psum algebra.

SURVEY.md section 4: 'multi-chip tests that assert shard-count-invariance
of logLik/counts' -- the count algebra being associative makes per-shard
accumulation + reduction exactly equal to the single-shard result.
"""

import os

import numpy as np
import pytest

from historian_tpu.core.seqs import read_fasta
from historian_tpu.core.tree import Tree
from historian_tpu.models.counts import EventCounts
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.parallel.pcounts import (
    arrays_to_counts,
    column_sharded_eigen_counts,
    counts_to_arrays,
    psum_counts,
    sharded_alignment_eigen_counts,
)


def load(ref_data):
    model = RateModel.from_file(os.path.join(ref_data, "testcount.jukescantor.json"))
    tree = Tree(open(os.path.join(ref_data, "testcount.nh")).read())
    gapped = read_fasta(os.path.join(ref_data, "testcount.historian.fa"))
    gapped = tree.reorder_seqs(gapped)
    return model, tree, [s.seq for s in gapped]


@pytest.mark.parametrize("n_shards", [2, 3, 8])
def test_column_shard_invariance(ref_data, n_shards):
    model, tree, rows = load(ref_data)
    single = column_sharded_eigen_counts(model, tree, rows, 1)
    sharded = column_sharded_eigen_counts(model, tree, rows, n_shards)
    np.testing.assert_allclose(sharded.root_count, single.root_count, atol=1e-12)
    np.testing.assert_allclose(sharded.eigen_count, single.eigen_count, atol=1e-12)
    assert abs(sharded.indel.lp - single.indel.lp) < 1e-9


def test_all_gap_padding_is_identity(ref_data):
    """Padding columns contribute exactly zero (enables equal-shape shards)."""
    model, tree, rows = load(ref_data)
    padded = [r + "----" for r in rows]
    a = column_sharded_eigen_counts(model, tree, rows, 1)
    b = column_sharded_eigen_counts(model, tree, padded, 1)
    np.testing.assert_allclose(a.eigen_count, b.eigen_count, atol=1e-12)
    assert abs(a.indel.lp - b.indel.lp) < 1e-12


def load_mix2(ref_data):
    model = RateModel.from_file(os.path.join(ref_data, "testrates.mix2.json"))
    tree = Tree(open(os.path.join(ref_data, "testcount.mix2.nh")).read())
    gapped = read_fasta(os.path.join(ref_data, "testcount.mix2.fa"))
    gapped = tree.reorder_seqs(gapped)
    return model, tree, [s.seq for s in gapped]


@pytest.mark.parametrize("n_dp", [1, 2, 4, 8])
def test_shard_map_counts_match_host_oracle(ref_data, n_dp):
    """The fused shard_map+psum E-step (the production -mesh path) equals
    the host accumulation, invariant to the mesh size."""
    import jax
    from jax.sharding import Mesh

    model, tree, rows = load(ref_data)
    host = column_sharded_eigen_counts(model, tree, rows, 1)
    mesh = Mesh(np.array(jax.devices()[:n_dp]), ("dp",))
    dev = sharded_alignment_eigen_counts(model, tree, rows, mesh)
    np.testing.assert_allclose(dev.root_count, host.root_count, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dev.eigen_count, host.eigen_count, rtol=1e-9, atol=1e-12)
    assert abs(dev.indel.lp - host.indel.lp) < 1e-9


def test_shard_map_counts_mixture_model(ref_data):
    """Mesh E-step on the 2-component mixture dataset (ep-style component
    axis rides inside each shard's einsums)."""
    import jax
    from jax.sharding import Mesh

    model, tree, rows = load_mix2(ref_data)
    host = column_sharded_eigen_counts(model, tree, rows, 1)
    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    dev = sharded_alignment_eigen_counts(model, tree, rows, mesh)
    np.testing.assert_allclose(dev.root_count, host.root_count, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dev.eigen_count, host.eigen_count, rtol=1e-9, atol=1e-12)
    assert abs(dev.indel.lp - host.indel.lp) < 1e-9


@pytest.mark.parametrize("spec", ["4x2", "2x2", "1x2"])
def test_shard_map_counts_ep_mesh(ref_data, spec):
    """2-D (dp, ep) mesh: mixture components shard over the ep axis (the
    production ep path, SURVEY section 2.7) -- the per-component fills are
    independent and the column-likelihood logsumexp becomes a pmax+psum,
    so results must match the host oracle bit-for-bit up to reassociation."""
    from historian_tpu.parallel.pcounts import set_mesh, clear_mesh

    model, tree, rows = load_mix2(ref_data)
    host = column_sharded_eigen_counts(model, tree, rows, 1)
    try:
        mesh = set_mesh(spec)
        dev = sharded_alignment_eigen_counts(model, tree, rows, mesh)
    finally:
        clear_mesh()
    np.testing.assert_allclose(dev.root_count, host.root_count, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(dev.eigen_count, host.eigen_count, rtol=1e-9, atol=1e-12)
    assert abs(dev.indel.lp - host.indel.lp) < 1e-9


def test_ep_mesh_rejects_indivisible_components(ref_data):
    """A 2-component model cannot shard over ep=3."""
    from historian_tpu.parallel.pcounts import set_mesh, clear_mesh

    model, tree, rows = load_mix2(ref_data)
    try:
        mesh = set_mesh("2x3")
        with pytest.raises(ValueError, match="divisible"):
            sharded_alignment_eigen_counts(model, tree, rows, mesh)
    finally:
        clear_mesh()


def test_cli_count_mesh_matches_reference_golden(ref_data, tmp_path, monkeypatch):
    """`count -mesh 8` produces the same counts JSON as the meshless run
    (which is golden-tested against the reference's testcount.out.json)."""
    import io
    from contextlib import redirect_stdout

    from historian_tpu.cli import main
    from historian_tpu.parallel.pcounts import clear_mesh

    args = [
        "count",
        "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
        "-recon", os.path.join(ref_data, "testcount.historian.fa"),
        "-tree", os.path.join(ref_data, "testcount.nh"),
    ]
    outs = []
    for extra in ([], ["-mesh", "8"]):
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert main(args + extra) == 0
        outs.append(buf.getvalue())
        clear_mesh()
    from tests.golden import assert_text_match

    assert_text_match(outs[1], outs[0], sig_figs=10)


def test_psum_counts_mesh_matches_host(ref_data):
    """EventCounts pytree reduction through shard_map+psum (uneven shard
    count -> zero-padding / folding) equals the host algebra."""
    import jax
    from jax.sharding import Mesh

    model, tree, rows = load(ref_data)
    shards = []
    for s in range(5):  # deliberately not a multiple of the mesh size
        ec = column_sharded_eigen_counts(model, tree, [r[s::5] for r in rows], 1)
        shards.append(ec.transform(model))
    host_total = psum_counts(shards, model.alphabet)
    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    dev_total = psum_counts(shards, model.alphabet, mesh=mesh)
    np.testing.assert_allclose(dev_total.sub_count, host_total.sub_count, rtol=1e-12)
    np.testing.assert_allclose(dev_total.root_count, host_total.root_count, rtol=1e-12)
    assert abs(dev_total.indel.lp - host_total.indel.lp) < 1e-9


def test_counts_pytree_roundtrip_and_psum_on_mesh(ref_data):
    """EventCounts flatten to psum-able pytrees; an 8-device pmap psum of
    per-shard counts equals the host-side algebra reduction."""
    import jax
    import jax.numpy as jnp

    model, tree, rows = load(ref_data)
    # build 8 per-shard EventCounts (transform eigen shards to real basis)
    shards = []
    for s in range(8):
        ec = column_sharded_eigen_counts(model, tree, [r[s::8] for r in rows], 1)
        shards.append(ec.transform(model))
    host_total = psum_counts(shards, model.alphabet)

    trees = [counts_to_arrays(c) for c in shards]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
    n_dev = min(8, len(jax.devices()))
    assert n_dev == 8, "expected 8 virtual CPU devices"
    reduced = jax.pmap(lambda t: jax.lax.psum(t, "dp"), axis_name="dp")(stacked)
    device_total = arrays_to_counts(jax.tree.map(lambda x: x[0], reduced), model.alphabet)
    np.testing.assert_allclose(device_total.sub_count, host_total.sub_count, rtol=1e-12)
    np.testing.assert_allclose(device_total.root_count, host_total.root_count, rtol=1e-12)
    assert abs(device_total.indel.lp - host_total.indel.lp) < 1e-9


@pytest.mark.slow
@pytest.mark.parametrize("n_sp", [2, 4, 8])
def test_sp_pair_forward_matches_single_chip(ref_data, n_sp):
    """Column-sharded wavefront Forward == single-device scan kernel."""
    import jax
    from jax.sharding import Mesh

    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward
    from historian_tpu.ops.sp_pairforward import sp_pair_forward

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "PF16593.pair.fa"))
    args, _ = chain_pair_forward_arrays(model, seqs[0].seq, seqs[1].seq, 1.0, 0.5, dtype=np.float64)
    _, lp_single = pair_forward(*args)

    devices = np.array(jax.devices()[:n_sp])
    mesh = Mesh(devices, ("sp",))
    lp_sp = sp_pair_forward(*args, mesh=mesh)
    assert abs(float(lp_single) - float(lp_sp)) < 1e-9


@pytest.mark.slow
def test_sp_pair_forward_banded(ref_data):
    """Sharded fill agrees under a banded envelope mask (odd Y => padding)."""
    import jax
    from jax.sharding import Mesh

    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward
    from historian_tpu.ops.sp_pairforward import sp_pair_forward

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "PF16593.pair.fa"))
    x, y = seqs[0].seq[:33], seqs[1].seq[:29]
    args, _ = chain_pair_forward_arrays(model, x, y, 0.7, 0.3, dtype=np.float64)
    absorb, rsx, rsy, ix, iy, mask, trans = args
    ii = np.arange(absorb.shape[0])[:, None]
    jj = np.arange(absorb.shape[1])[None, :]
    band = np.abs(ii - jj) <= 10
    band[0, :] = band[:, 0] = True
    band[-1, -1] = True
    mask = np.asarray(mask) & band
    _, lp_single = pair_forward(absorb, rsx, rsy, ix, iy, mask, trans)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    lp_sp = sp_pair_forward(absorb, rsx, rsy, ix, iy, mask, trans, mesh=mesh)
    assert abs(float(lp_single) - float(lp_sp)) < 1e-9


@pytest.mark.slow
@pytest.mark.parametrize("n_pp", [2, 3, 8])
def test_pp_pipeline_matches_single_chip(ref_data, n_pp):
    """Row-block pipeline stages over microbatched pairs == scan kernel."""
    import jax
    from jax.sharding import Mesh

    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward
    from historian_tpu.parallel.pp_pairforward import pp_pair_forward_lp

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "PF16593.pair.fa"))
    x, y = seqs[0].seq, seqs[1].seq
    pairs = [(x, y), (x[:17], y[:23]), ((x * 2)[:40], y), (y, x)]
    argsets = []
    lps = []
    L = max(max(len(a) for a, _ in pairs), max(len(b) for _, b in pairs))
    for a, b in pairs:
        # pad sequences to a common shape by tiling (pipeline wants equal shapes)
        args, _ = chain_pair_forward_arrays(model, (a * 9)[:L], (b * 9)[:L], 1.0, 0.5, dtype=np.float64)
        argsets.append(args)
        lps.append(float(pair_forward(*args)[1]))

    absorb = np.stack([np.asarray(a[0]) for a in argsets])
    rsx = np.stack([np.asarray(a[1]) for a in argsets])
    rsy = np.stack([np.asarray(a[2]) for a in argsets])
    ix = np.stack([np.asarray(a[3]) for a in argsets])
    iy = np.stack([np.asarray(a[4]) for a in argsets])
    trans = np.asarray(argsets[0][6])

    mesh = Mesh(np.array(jax.devices()[:n_pp]), ("pp",))
    lp_pp = np.asarray(pp_pair_forward_lp(absorb, rsx, rsy, ix, iy, trans, mesh=mesh))
    np.testing.assert_allclose(lp_pp, lps, atol=1e-9)


def test_dp_sp_mesh_composition(ref_data):
    """2-D mesh: batch over dp while each pair's columns shard over sp."""
    import jax
    from jax.sharding import Mesh

    from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward
    from historian_tpu.ops.sp_pairforward import sp_pair_forward_batch

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    seqs = read_fasta(os.path.join(ref_data, "PF16593.pair.fa"))
    x, y = seqs[0].seq, seqs[1].seq
    pairs = [((x * 5)[:60], (y * 5)[:50]), ((y * 5)[:60], (x * 5)[:50])]
    argsets = [chain_pair_forward_arrays(model, a, b, 1.0, 0.5, dtype=np.float64)[0]
               for a, b in pairs]
    lps = [float(pair_forward(*a)[1]) for a in argsets]
    absorb = np.stack([np.asarray(a[0]) for a in argsets])
    rsx = np.stack([np.asarray(a[1]) for a in argsets])
    rsy = np.stack([np.asarray(a[2]) for a in argsets])
    ix = np.stack([np.asarray(a[3]) for a in argsets])
    iy = np.stack([np.asarray(a[4]) for a in argsets])
    mask = np.asarray(argsets[0][5])
    trans = np.asarray(argsets[0][6])

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "sp"))
    lp = np.asarray(sp_pair_forward_batch(absorb, rsx, rsy, ix, iy, mask, trans, mesh=mesh))
    np.testing.assert_allclose(lp, lps, atol=1e-9)


@pytest.mark.slow
def test_distributed_init_single_host_count(ref_data, tmp_path):
    """jax.distributed bring-up (single-process, loopback coordinator)
    followed by the production mesh count path: the multi-host recipe is
    init -> global device list -> same set_mesh/psum code.  Runs in a
    subprocess because jax.distributed owns process-global state."""
    import subprocess
    import sys

    script = f"""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["HISTORIAN_DIST"] = "1"
os.environ["HISTORIAN_PLATFORM"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from historian_tpu.parallel.dist import init_from_env, global_mesh, is_initialized
assert init_from_env() and is_initialized()
assert jax.process_count() == 1
import numpy as np
from historian_tpu.core.seqs import read_fasta
from historian_tpu.core.tree import Tree
from historian_tpu.models.ratemodel import RateModel
from historian_tpu.parallel import pcounts
mesh = global_mesh(4)
pcounts._ACTIVE_MESH = mesh
D = {str(ref_data)!r}
model = RateModel.from_file(os.path.join(D, "testcount.jukescantor.json"))
tree = Tree(open(os.path.join(D, "testcount.nh")).read())
gapped = tree.reorder_seqs(read_fasta(os.path.join(D, "testcount.historian.fa")))
rows = [s.seq for s in gapped]
on_mesh = pcounts.sharded_alignment_eigen_counts(model, tree, rows, mesh)
oracle = pcounts.column_sharded_eigen_counts(model, tree, rows, 1)
np.testing.assert_allclose(on_mesh.root_count, oracle.root_count, atol=1e-9)
np.testing.assert_allclose(on_mesh.eigen_count, oracle.eigen_count, atol=1e-9)
print("DIST-OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "DIST-OK" in proc.stdout


@pytest.mark.slow
def test_sp_col_forward_production_merge(ref_data):
    """The SP (x-sharded ring-wavefront) column-major fill equals the
    single-device kernel on a REAL production merge: a gp120 leaf chain
    composed against a sampled-profile DAG under the guide envelope --
    the dominant merge shape `recon` dispatches."""
    import os

    from historian_tpu.core.alignpath import Alignment, GuideAlignmentEnvelope
    from historian_tpu.core.seqs import read_fasta
    from historian_tpu.engine.forward import ForwardMatrix
    from historian_tpu.engine.pairhmm import PairHMM
    from historian_tpu.engine.profile import Profile
    from historian_tpu.models.ratemodel import ProbModel, RateModel
    from historian_tpu.ops import devicedp
    from historian_tpu.ops.colforward import col_pair_forward_cells
    from historian_tpu.ops.sp_colforward import sp_col_forward_cells
    from historian_tpu.utils.rng import MT19937

    model = RateModel.from_file(os.path.join(ref_data, "testamino.json"))
    gapped = read_fasta(os.path.join(ref_data, "gp120.guide.fa"))[:3]
    align = Alignment.from_gapped(gapped)
    seqs = align.ungapped
    profs = [
        Profile.from_sequence(model.components, model.alphabet, s, i)
        for i, s in enumerate(seqs)
    ]
    hmm = PairHMM(ProbModel(model, 0.5), ProbModel(model, 0.5), model.ins_prob)
    env01 = GuideAlignmentEnvelope(align.path, 0, 1, 12)
    f01 = ForwardMatrix(profs[0], profs[1], hmm, 3, env01)
    p01 = f01.sample_profile(MT19937(5489), 10, 0)
    assert p01.as_chain() is None  # a genuine sampled-profile DAG

    env = GuideAlignmentEnvelope(align.path, 2, 0, 12)
    dp = ForwardMatrix(profs[2], p01, hmm, 4, env)
    inp = devicedp.col_kernel_inputs(dp)
    args = (
        inp["absorb_t"], inp["rootsub_x"], inp["ins_x"], inp["rootsub_y"],
        inp["ins_y"], inp["mask_t"], inp["trans"], inp["x_ready"],
        inp["x_eos"], inp["y_src"], inp["y_lp"], inp["y_null"], inp["y_ready"],
    )
    single = np.asarray(col_pair_forward_cells(*args))

    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("sp",))
    sp = np.asarray(sp_col_forward_cells(*args, mesh=mesh))
    np.testing.assert_allclose(sp, single, rtol=1e-9, atol=1e-9)
    # and the kernel agrees with the host fill on the real cells
    host = dp.cells[: dp.x_size - 1, : dp.y_size - 1]
    got = sp[: inp["ny"], : inp["nx"]].transpose(1, 0, 2)
    hx = np.where(np.isfinite(host), host, -1e99)
    gx = np.where(got < -1e25, -1e99, got)
    np.testing.assert_allclose(gx, hx, rtol=1e-9, atol=1e-9)


@pytest.mark.slow
def test_recon_through_sp_router(ref_data, monkeypatch):
    """Full production recon driven through the ROUTER with the SP merge
    route engaged on an 8-device mesh (-mesh 8 + forced SP): the output
    must match the meshless run byte-for-byte and the golden file
    (reference recon.cpp:917-1052 merge loop; SP design SURVEY 2.7)."""
    import io

    from historian_tpu.parallel import spmerge
    from historian_tpu.parallel.pcounts import clear_mesh, set_mesh
    from historian_tpu.recon import FORMAT_FASTA, Reconstructor

    def run():
        r = Reconstructor()
        r.guide_align_try_all_pairs = True
        r.diag_env_params.sparse = False
        r.max_distance_from_guide = 40
        r.min_post_prob = 0.001
        r.use_posteriors_for_profile = True
        r.refine_reconstruction = False
        r.output_format = FORMAT_FASTA
        r.model_filename = os.path.join(ref_data, "testcount.jukescantor.json")
        r.fasta_guide_filenames = [os.path.join(ref_data, "testcount.fa")]
        r.tree_filename = os.path.join(ref_data, "testcount.nh")
        r.load_model()
        r.load_seqs()
        r.reconstruct_all()
        buf = io.StringIO()
        r.write_recon(buf)
        return buf.getvalue()

    host = run()
    with open(os.path.join(ref_data, "testcount.historian.fa")) as f:
        assert host == f.read()

    calls = [0]
    orig = spmerge.sp_forward_cells

    def counting(dp, mesh):
        out = orig(dp, mesh)
        if out is not None:
            calls[0] += 1
        return out

    monkeypatch.setenv("HISTORIAN_SP", "1")
    monkeypatch.setattr(spmerge, "sp_forward_cells", counting)
    set_mesh(8)
    try:
        sp = run()
    finally:
        clear_mesh()
    assert calls[0] > 0, "no merge routed through the SP ring"
    assert sp == host


def test_recon_window_pipeline_streams_across_levels(ref_data, tmp_path, monkeypatch):
    """Production recon through the in-flight merge WINDOW (SURVEY 2.7 pp
    axis: children's profiles stream into their parents' merges with no
    level barrier).  On a balanced 4-leaf tree the two cherry merges are
    independent, so the pipelined scheduler must hold >=2 merges in
    flight, and its output must match the strict-postorder host run
    byte for byte (reference merge loop recon.cpp:917-1052)."""
    import io

    from historian_tpu.recon import FORMAT_FASTA, Reconstructor

    seqs = tmp_path / "four.fa"
    seqs.write_text(
        ">s1\nACGTACGTGGAACGTACGTACGT\n"
        ">s2\nACGTACGTGGTACGTACCT\n"
        ">s3\nACGGACGTCCAACGTACGTAC\n"
        ">s4\nACGGACGTCCTTACGTACGGTAC\n"
    )
    treef = tmp_path / "four.nh"
    treef.write_text("((s1:0.3,s2:0.3)n12:0.2,(s3:0.3,s4:0.3)n34:0.2)root;\n")

    def run():
        r = Reconstructor()
        r.guide_align_try_all_pairs = True
        r.diag_env_params.sparse = False
        r.max_distance_from_guide = 40
        r.refine_reconstruction = False
        r.output_format = FORMAT_FASTA
        r.model_filename = os.path.join(ref_data, "testcount.jukescantor.json")
        r.seq_filenames = [str(seqs)]
        r.tree_filename = str(treef)
        r.load_model()
        r.load_seqs()
        r.reconstruct_all()
        buf = io.StringIO()
        r.write_recon(buf)
        return buf.getvalue(), r.sched_max_in_flight

    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "0")
    host, host_depth = run()
    assert host_depth == 1  # strict sequential postorder

    monkeypatch.setenv("HISTORIAN_DEVICE_DP", "1")
    monkeypatch.setenv("HISTORIAN_DEVICE_TRACE", "1")
    piped, piped_depth = run()
    assert piped_depth >= 2, "window never held two merges in flight"
    assert piped == host


@pytest.mark.parametrize("pipelined", [False, True])
def test_band_doubling_retry_rebuilds_merge(ref_data, tmp_path, monkeypatch, pipelined):
    """The zero-likelihood band-doubling retry (recon.cpp:954-975) must
    rebuild the merge on both scheduler paths: the strict-postorder host
    drain and the pipelined window's _arm step.  A forced -inf lp_end on
    the first ForwardMatrix of one internal node simulates an envelope
    that excludes every path."""
    import io

    import historian_tpu.recon as recon_mod
    from historian_tpu.recon import FORMAT_FASTA, Reconstructor

    seqs = tmp_path / "four.fa"
    seqs.write_text(
        ">s1\nACGTACGTGGAACGTACGTACGT\n"
        ">s2\nACGTACGTGGTACGTACCT\n"
        ">s3\nACGGACGTCCAACGTACGTAC\n"
        ">s4\nACGGACGTCCTTACGTACGGTAC\n"
    )
    treef = tmp_path / "four.nh"
    treef.write_text("((s1:0.3,s2:0.3)n12:0.2,(s3:0.3,s4:0.3)n34:0.2)root;\n")

    real_fm = recon_mod.ForwardMatrix
    builds: list[int] = []
    sabotaged = [False]

    class Sabotage(real_fm):
        def __init__(self, l_prof, r_prof, hmm, node, *a, **k):
            super().__init__(l_prof, r_prof, hmm, node, *a, **k)
            builds.append(node)
            if node == 5 and not sabotaged[0]:
                sabotaged[0] = True
                self.lp_end = -np.inf  # simulate an all-excluding envelope

    monkeypatch.setattr(recon_mod, "ForwardMatrix", Sabotage)
    if pipelined:
        monkeypatch.setenv("HISTORIAN_DEVICE_DP", "1")
        monkeypatch.setenv("HISTORIAN_DEVICE_TRACE", "1")
    else:
        monkeypatch.setenv("HISTORIAN_DEVICE_DP", "0")

    r = Reconstructor()
    r.guide_align_try_all_pairs = True
    r.diag_env_params.sparse = False
    r.max_distance_from_guide = 2
    r.refine_reconstruction = False
    r.output_format = FORMAT_FASTA
    r.model_filename = os.path.join(ref_data, "testcount.jukescantor.json")
    r.seq_filenames = [str(seqs)]
    r.tree_filename = str(treef)
    r.load_model()
    r.load_seqs()
    r.reconstruct_all()
    buf = io.StringIO()
    r.write_recon(buf)
    out = buf.getvalue()

    assert sabotaged[0], "the sabotage never fired"
    assert builds.count(5) >= 2, "retry never rebuilt the sabotaged merge"
    assert out.startswith(">") and "root" in out
