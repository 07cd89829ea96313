"""Tropical (Viterbi) pair kernel vs an independent numpy oracle."""

import numpy as np
import pytest

from historian_tpu.models.ratemodel import RateModel, ProbModel
from historian_tpu.engine.pairhmm import PairHMM
from historian_tpu.ops.pairforward import chain_pair_forward_arrays, pair_forward
from historian_tpu.ops.tropical import NEG, tropical_pair_forward


def _numpy_viterbi(absorb, rsx, rsy, ix, iy, mask, trans):
    """Loop-form max-plus fill: same recurrence as the kernel but written
    cell-by-cell in f64 (independent of scans/vmaps), forward.cpp:95-202
    with sum replaced by max."""
    (imm_imm, imm_imd, imm_idm, imm_imi, imm_iiw, imm_eee,
     imd_imm, imd_imd, imd_idm, imd_eee,
     idm_imm, idm_imd, idm_idm, idm_eee,
     imi_imm, imi_imd, imi_imi, imi_iiw, imi_eee,
     iiw_imm, iiw_idm, iiw_iiw, iiw_eee) = (float(trans[k]) for k in range(23))
    X1, Y1 = absorb.shape
    c = np.full((X1, Y1, 5), NEG)
    for i in range(X1):
        x_ready = (i < X1 - 1) or (X1 == 1)
        # pass 1 over the row: states fed by row i-1 (fully computed)
        for j in range(Y1):
            y_ready = (j < Y1 - 1) or (Y1 == 1)
            if not mask[i, j]:
                continue
            if i > 0 and y_ready:
                p = c[i - 1, j]
                c[i, j, 1] = max(p[0] + imm_imd, p[1] + imd_imd,
                                 p[2] + idm_imd, p[3] + imi_imd) + rsx[i]
                c[i, j, 4] = max(p[0] + imm_iiw, p[3] + imi_iiw,
                                 p[4] + iiw_iiw) + ix[i]
            if i > 0 and j > 0:
                p = c[i - 1, j - 1]
                c[i, j, 0] = max(p[0] + imm_imm, p[1] + imd_imm, p[2] + idm_imm,
                                 p[3] + imi_imm, p[4] + iiw_imm) + absorb[i, j]
            if i == 0 and j == 0:
                c[0, 0, 0] = 0.0
        # pass 2 along the row: the IDM/IMI chains (read the previous
        # COLUMN of this row, so left to right)
        idm_prev = NEG
        imi_prev = NEG
        for j in range(Y1):
            if not (mask[i, j] and x_ready):
                c[i, j, 2] = NEG
                c[i, j, 3] = NEG
                idm_prev = NEG
                imi_prev = NEG
                continue
            other = NEG
            imi_other = NEG
            if j > 0:
                src = c[i, j - 1]
                other = max(src[0] + imm_idm, src[1] + imd_idm, src[4] + iiw_idm)
                imi_other = src[0] + imm_imi
            c[i, j, 2] = max(other + rsy[j], idm_prev + idm_idm + rsy[j])
            c[i, j, 3] = max(imi_other + iy[j], imi_prev + imi_imi + iy[j])
            idm_prev = c[i, j, 2]
            imi_prev = c[i, j, 3]
    end = c[X1 - 1, Y1 - 1]
    lp_best = max(end[0] + imm_eee, end[1] + imd_eee, end[2] + idm_eee,
                  end[3] + imi_eee, end[4] + iiw_eee)
    return c, lp_best


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tropical_matches_numpy_oracle(ref_data, seed):
    model = RateModel.from_file(f"{ref_data}/testamino.json")
    rng = np.random.RandomState(seed)
    alpha = model.alphabet.symbols
    sx = "".join(alpha[i] for i in rng.randint(0, 20, size=7))
    sy = "".join(alpha[i] for i in rng.randint(0, 20, size=9))
    args, _ = chain_pair_forward_arrays(model, sx, sy, 0.8, 0.4)
    absorb, rsx, rsy, ix, iy, mask, trans = (np.asarray(a) for a in args)
    _, lp_dev = tropical_pair_forward(*args)
    _, lp_np = _numpy_viterbi(absorb, rsx, rsy, ix, iy, mask, trans)
    assert abs(float(lp_dev) - lp_np) < 1e-3  # kernel is f32, oracle f64

    # semiring sanity: Viterbi best-path score never exceeds the Forward
    # sum over paths
    _, lp_fwd = pair_forward(*args)
    assert float(lp_dev) <= float(lp_fwd) + 1e-9
