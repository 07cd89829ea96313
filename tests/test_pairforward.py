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


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
