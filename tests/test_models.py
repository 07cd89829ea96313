"""Model-layer tests against reference goldens.

Mirrors the reference harnesses testrateio / testmatexp / testsubcount /
testnumsubcount / testcountio (reference Makefile:221-229, 281-293,
300-302) on the same data files.
"""

import json
import os

import numpy as np
import pytest

from historian_tpu.core.alphabet import Alphabet
from historian_tpu.models.counts import EventCounts, IndelCounts
from historian_tpu.models.eigen import EigenModel
from historian_tpu.models.gamma import make_discretized_gamma_model
from historian_tpu.models.presets import named_model, preset_names
from historian_tpu.models.ratemodel import ProbModel, RateModel, decay_wait_time

from .golden import assert_json_close, assert_text_match, load_lenient_json


def data(ref_data, name):
    return os.path.join(ref_data, name)


def read(ref_data, name):
    with open(data(ref_data, name)) as f:
        return f.read()


# -------------------------------------------------------------- rate model IO
@pytest.mark.parametrize(
    "src,expected",
    [
        ("testrates.json", "testrates.out.json"),
        ("testrates.out.json", "testrates.out.json"),
        ("testrates.mix2.json", "testrates.mix2.out.json"),
        ("testrates.mix2.out.json", "testrates.mix2.out.json"),
    ],
)
def test_rateio_golden(ref_data, src, expected):
    model = RateModel.from_json_string(read(ref_data, src))
    assert_text_match(model.to_json_string(), read(ref_data, expected), sig_figs=4)


def test_rate_model_equilibrium(ref_data):
    # testrates.json has no rootprob: equilibrium of the A->T,C->T,G->T chain is all-T
    model = RateModel.from_json_string(read(ref_data, "testrates.json"))
    np.testing.assert_allclose(model.ins_prob[0], [0, 0, 0, 1], atol=1e-10)
    # Jukes-Cantor equilibrium is uniform
    jc = RateModel.from_json_string(read(ref_data, "testforward.jukescantor.json"))
    np.testing.assert_allclose(jc.ins_prob[0], [0.25] * 4, atol=1e-12)


# ------------------------------------------------------------------------ expm
def test_matexp_golden(ref_data):
    model = RateModel.from_json_string(read(ref_data, "testrates.json"))
    probs = ProbModel(model, 1.0)
    assert_text_match(probs.to_json_string(), read(ref_data, "testrates.probs.json"), sig_figs=6)


def test_matexp_eigen_agrees(ref_data):
    for fn in ["testrates.json", "testrates.mix2.json", "testforward.jukescantor.json"]:
        model = RateModel.from_json_string(read(ref_data, fn))
        eigen = EigenModel(model)
        for t in [0.01, 0.5, 1.0, 5.0]:
            np.testing.assert_allclose(
                eigen.sub_prob_matrix(t), model.sub_prob_matrix(t), atol=1e-9
            )


def test_expm_rows_sum_to_one():
    lg = named_model("lg")
    p = lg.sub_prob_matrix(0.7)
    np.testing.assert_allclose(p.sum(axis=-1), 1.0, atol=1e-10)
    assert np.all(p >= 0)


# ------------------------------------------------------------------ subcounts
def run_subcount(ref_data, model_file, src_c, dest_c):
    """Reimplementation of the t/testsubcount.cpp harness."""
    model = RateModel.from_json_string(read(ref_data, model_file))
    eigen = EigenModel(model)
    src = model.alphabet.tokenize_or_die(src_c)
    dest = model.alphabet.tokenize_or_die(dest_c)
    t = 1.0
    sub = eigen.sub_prob_matrix(t)
    esub = eigen.eigen_sub_count(t)
    p = np.array([sub[c, src, dest] for c in range(model.components)])
    norm = p.sum()
    counts = np.stack(
        [
            eigen.sub_count_matrix(c, src, dest, sub[c], esub[c]) * (p[c] / norm)
            for c in range(model.components)
        ]
    )
    root = np.zeros((model.components, model.alphabet_size))
    root[:, src] = p / norm
    return model, root, counts


def golden_subcount(model, root, counts, golden_obj):
    sym = model.alphabet.symbol
    a = model.alphabet_size

    def component(cpt):
        return {
            "root": {sym(i): root[cpt, i] for i in range(a)},
            "sub": {
                sym(i): {sym(j): counts[cpt, i, j] for j in range(a) if j != i}
                for i in range(a)
            },
            "wait": {sym(i): counts[cpt, i, i] for i in range(a)},
        }

    if model.components > 1:
        got = {"mixture": [component(c) for c in range(model.components)]}
    else:
        got = component(0)
    assert_json_close(got, golden_obj, rel=5e-4, atol=1e-5)


@pytest.mark.parametrize(
    "model_file,golden",
    [
        ("testrates.json", "testsubcount1.json"),
        ("testforward.jukescantor.json", "testsubcount2.json"),
        ("testrates.mix2.json", "testsubcount.mix2.json"),
    ],
)
def test_subcount_golden(ref_data, model_file, golden):
    model, root, counts = run_subcount(ref_data, model_file, "A", "T")
    golden_obj = load_lenient_json(read(ref_data, golden))
    golden_subcount(model, root, counts, golden_obj)


def test_numsubcount_vs_numerical(ref_data):
    """Eigen closed-form count integral vs brute-force numerical integration
    (t/testnumsubcount.cpp semantics, coarser grid for speed)."""
    model = RateModel.from_json_string(read(ref_data, "testforward.jukescantor.json"))
    eigen = EigenModel(model)
    for (a_c, b_c, i_c, j_c, T) in [("A", "T", "A", "T", 0.01), ("A", "T", "A", "T", 1.0), ("A", "T", "C", "G", 1.0)]:
        a = model.alphabet.tokenize_or_die(a_c)
        b = model.alphabet.tokenize_or_die(b_c)
        i = model.alphabet.tokenize_or_die(i_c)
        j = model.alphabet.tokenize_or_die(j_c)
        sub = eigen.sub_prob_matrix(T)
        esub = eigen.eigen_sub_count(T)
        count = eigen.sub_count_matrix(0, a, b, sub[0], esub[0])[i, j]
        n_steps = 2000
        ts = (np.arange(n_steps) + 0.0) * (T / n_steps)
        num = sum(
            eigen.sub_prob_matrix(t)[0, a, i] * eigen.sub_prob_matrix(T - t - T / n_steps)[0, j, b]
            for t in ts
        )
        num *= model.sub_rate[0, i, j] * (T / n_steps) / sub[0, a, b]
        assert abs(count - num) < 2e-3 * max(1.0, abs(count))


# --------------------------------------------------------------------- counts
def test_counts_io_roundtrip(ref_data):
    text = read(ref_data, "testcount.count.json")
    counts = EventCounts.from_json_string(text)
    assert_text_match(counts.to_json_string(), text, sig_figs=4)


def test_counts_algebra(ref_data):
    c1 = EventCounts.from_json_string(read(ref_data, "testcount.out.json"))
    c2 = EventCounts.from_json_string(read(ref_data, "testcount.out.json"))
    total = c1 + c2
    np.testing.assert_allclose(total.sub_count, 2 * c1.sub_count)
    assert total.indel.ins == 2 * c1.indel.ins
    assert total.indel.lp == 2 * c1.indel.lp
    # the reference testsum golden: sum of testcount.out.json twice
    golden = EventCounts.from_json_string(read(ref_data, "testcount.sum.json"))
    np.testing.assert_allclose(total.sub_count, golden.sub_count, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(total.root_count, golden.root_count, rtol=1e-3, atol=1e-5)


def test_optimize_recovers_rates():
    """M-step on exact expected counts of a model recovers that model."""
    alph = Alphabet("ACGT")
    model = RateModel(
        alph,
        ins_rate=0.05,
        del_rate=0.08,
        ins_ext_prob=0.3,
        del_ext_prob=0.4,
        sub_rate=np.array([[[-3, 1, 1, 1], [2, -4, 1, 1], [1, 1, -3, 1], [1, 1, 2, -4.0]]]),
    )
    counts = EventCounts(alph, 1)
    wait = 7.0
    counts.sub_count[0] = model.sub_rate[0] * wait
    np.fill_diagonal(counts.sub_count[0], wait)
    counts.root_count[0] = model.ins_prob[0] * 10
    counts.indel.ins = model.ins_rate * 100
    counts.indel.ins_time = 100.0
    counts.indel.del_ = model.del_rate * 100
    counts.indel.del_time = 100.0
    counts.indel.ins_ext = counts.indel.ins * model.ins_ext_prob / (1 - model.ins_ext_prob)
    counts.indel.del_ext = counts.indel.del_ * model.del_ext_prob / (1 - model.del_ext_prob)
    fitted = RateModel(alph)
    counts.optimize(fitted)
    np.testing.assert_allclose(fitted.sub_rate, model.sub_rate, rtol=1e-10)
    np.testing.assert_allclose(fitted.ins_prob, model.ins_prob, rtol=1e-10)
    assert abs(fitted.ins_rate - model.ins_rate) < 1e-12
    assert abs(fitted.ins_ext_prob - model.ins_ext_prob) < 1e-12
    assert abs(fitted.del_ext_prob - model.del_ext_prob) < 1e-12


def test_indel_counts_branch():
    """Walk a parent/child path: M M I I M D columns."""
    alph = Alphabet("ACGT")
    model = RateModel(alph, ins_rate=0.1, del_rate=0.2, ins_ext_prob=0.5, del_ext_prob=0.5,
                      sub_rate=np.array([[[-1, 1/3, 1/3, 1/3]] * 4]) * 1.0)
    # columns: match, match, insert, insert, match, delete
    parent = np.array([True, True, False, False, True, True])
    child = np.array([True, True, True, True, True, False])
    ic = IndelCounts()
    ic.accumulate_branch(model, 1.0, parent, child, 1.0)
    assert ic.ins == 1 and ic.ins_ext == 1
    assert ic.del_ == 1 and ic.del_ext == 0
    # 3 match-to-match style columns contribute full time each...
    assert ic.ins_time > 0 and ic.del_time > 0
    assert np.isfinite(ic.lp) and ic.lp < 0


def test_decay_wait_time_limits():
    # small rate*t: wait ~ t/2
    assert abs(decay_wait_time(1e-6, 1.0) - 0.5) < 1e-3
    # large rate*t: wait ~ 1/rate
    assert abs(decay_wait_time(100.0, 10.0) - 0.01) < 1e-6


# --------------------------------------------------------------------- presets
def test_presets_match_reference_models():
    for name in ["lg", "wag", "jtt", "dayhoff", "jc", "jcrna", "ECMrest", "ECMunrest"]:
        mine = named_model(name)
        ref_name = {"jtt": "jones"}.get(name, name)
        theirs = RateModel.from_file(f"/root/reference/model/{ref_name}.json")
        assert mine.alphabet.symbols == theirs.alphabet.symbols
        np.testing.assert_allclose(mine.sub_rate, theirs.sub_rate, atol=1e-12)
        np.testing.assert_allclose(mine.ins_prob, theirs.ins_prob, atol=1e-12)


def test_preset_unknown():
    with pytest.raises(KeyError):
        named_model("nosuchmodel")


# ----------------------------------------------------------------------- gamma
def test_gamma_discretization():
    jc = named_model("jc")
    g = make_discretized_gamma_model(jc, 4, 0.5)
    assert g.components == 4
    np.testing.assert_allclose(g.cpt_weight, 0.25)
    # mean rate multiplier is 1 => average subrate equals base
    np.testing.assert_allclose(g.sub_rate.mean(axis=0), jc.sub_rate[0], rtol=1e-12)
    # multipliers increase across bins
    mult = g.sub_rate[:, 0, 1] / jc.sub_rate[0, 0, 1]
    assert np.all(np.diff(mult) > 0)


# -------------------------------------------------------------------- distance
def test_ml_distance_jc():
    """ML distance on JC data matches the analytic JC formula."""
    jc = named_model("jc").normalize_substitution_rate()
    x = "A" * 60 + "C" * 20 + "G" * 20
    y = "A" * 60 + "C" * 10 + "T" * 10 + "G" * 10 + "A" * 10
    d = jc.ml_distance(x, y)
    counts = jc.pair_count_matrix(x, y)
    jc_analytic = jc.jukes_cantor_distance(counts)
    assert abs(d - jc_analytic) < 0.02 * jc_analytic


def test_ml_distance_identical_and_saturated():
    jc = named_model("jc").normalize_substitution_rate()
    d_same = jc.ml_distance("ACGTACGT", "ACGTACGT")
    assert d_same < 1e-3
    # saturated pair: distance pinned at upper scan bound
    d_far = jc.ml_distance("AAAA", "CCCC")
    assert d_far > 1.0


def test_numsubcount_ecmunrest_codon_scale():
    """Eigen count integral on the 61-codon ECMunrest model vs numerical
    integration (the reference's testnumsubcount at codon scale)."""
    from historian_tpu.models.presets import named_model

    model = named_model("ECMunrest")
    eigen = EigenModel(model)
    T = 0.4
    sub = eigen.sub_prob_matrix(T)
    esub = eigen.eigen_sub_count(T)
    rng = np.random.RandomState(0)
    toks = rng.randint(0, model.alphabet_size, size=6)
    n_steps = 400
    ts = np.arange(n_steps) * (T / n_steps)
    sub_grid = [eigen.sub_prob_matrix(t)[0] for t in ts]
    sub_grid_rev = [eigen.sub_prob_matrix(T - t - T / n_steps)[0] for t in ts]
    for (a, b, i, j) in [
        (toks[0], toks[1], toks[2], toks[3]),
        (toks[4], toks[5], toks[4], toks[5]),
        (toks[0], toks[0], toks[1], toks[2]),
    ]:
        if i == j:
            continue
        count = eigen.sub_count_matrix(0, a, b, sub[0], esub[0])[i, j]
        assert np.isfinite(count) and count >= -1e-9
        num = sum(sg[a, i] * sr[j, b] for sg, sr in zip(sub_grid, sub_grid_rev))
        num *= model.sub_rate[0, i, j] * (T / n_steps) / sub[0, a, b]
        assert abs(count - num) < 5e-3 * max(1.0, abs(count))


def test_numsubcount_complex_spectrum_cyclic():
    """Closed-form count integral with genuinely complex eigenvalues
    (cyclic non-reversible rate matrix) vs numerical integration."""
    alph = Alphabet("ACGT")
    rate = np.array([[0.0, 1.0, 0.05, 0.05],
                     [0.05, 0.0, 1.0, 0.05],
                     [0.05, 0.05, 0.0, 1.0],
                     [1.0, 0.05, 0.05, 0.0]])
    np.fill_diagonal(rate, -rate.sum(1))
    model = RateModel(alph, ins_rate=0.01, del_rate=0.01, ins_ext_prob=0.5,
                      del_ext_prob=0.5, sub_rate=rate[None],
                      cpt_weight=np.ones(1), ins_prob=np.full((1, 4), 0.25))
    eigen = EigenModel(model)
    assert np.abs(eigen.eval.imag).max() > 0.1  # complex spectrum
    T = 0.7
    sub = eigen.sub_prob_matrix(T)
    esub = eigen.eigen_sub_count(T)
    n_steps = 1000
    ts = np.arange(n_steps) * (T / n_steps)
    sub_grid = [eigen.sub_prob_matrix(t)[0] for t in ts]
    sub_grid_rev = [eigen.sub_prob_matrix(T - t - T / n_steps)[0] for t in ts]
    for (a, b, i, j) in [(0, 3, 0, 1), (1, 1, 2, 3), (2, 0, 3, 0)]:
        count = eigen.sub_count_matrix(0, a, b, sub[0], esub[0])[i, j]
        assert np.isfinite(count) and count >= -1e-9
        num = sum(sg[a, i] * sr[j, b] for sg, sr in zip(sub_grid, sub_grid_rev))
        num *= model.sub_rate[0, i, j] * (T / n_steps) / sub[0, a, b]
        assert abs(count - num) < 5e-3 * max(1.0, abs(count))


@pytest.mark.parametrize(
    "model_file,a,b,i,j,T,lam,golden",
    [
        ("testforward.jukescantor.json", "A", "T", "A", "T", 0.01, 4.0, "testnumsubcount1.out"),
        ("testforward.jukescantor.json", "A", "T", "A", "T", 1.0, 4.0, "testnumsubcount2.out"),
        ("testforward.jukescantor.json", "A", "T", "C", "G", 1.0, 4.0, "testnumsubcount3.out"),
        ("testrates.json", "A", "T", "A", "T", 1.0, None, "testnumsubcount4.out"),
    ],
)
def test_numsubcount_golden(ref_data, model_file, a, b, i, j, T, lam, golden):
    """Replicates t/testnumsubcount.cpp: the closed-form eigenbasis
    substitution-count integral (models/eigen.sub_count_matrix, reference
    model.cpp:1298-1321) vs brute-force numerical integration and, for
    Jukes-Cantor, the exact analytic count (reference Makefile:287-291)."""
    model = RateModel.from_file(os.path.join(ref_data, model_file))
    eigen = EigenModel(model)
    alph = model.alphabet
    a, b, i, j = (alph.tokenize_char(c) for c in (a, b, i, j))

    sub = eigen.sub_prob_matrix(T)[0]
    esub = eigen.eigen_sub_count(T)[0]
    count = eigen.sub_count_matrix(0, a, b, sub, esub)[i, j]

    # numerical integration on the reference's grid: 1e5 steps,
    # second factor evaluated at T - t - tStep (testnumsubcount.cpp:40-45)
    n_steps = 100000
    t_step = T / n_steps
    ts = np.arange(n_steps) * t_step
    exp_fwd = np.exp(eigen.eval[0][None, :] * ts[:, None])            # [t, k]
    exp_rev = np.exp(eigen.eval[0][None, :] * (T - ts - t_step)[:, None])
    p_ai = np.einsum("k,tk,k->t", eigen.evec[0, a], exp_fwd, eigen.evec_inv[0][:, i]).real
    p_jb = np.einsum("k,tk,k->t", eigen.evec[0, j], exp_rev, eigen.evec_inv[0][:, b]).real
    num = np.clip(p_ai, 0, 1) @ np.clip(p_jb, 0, 1)
    num *= model.sub_rate[0, i, j] * t_step / sub[a, b]

    g = "{:g}".format
    lines = [f"Eigenvector method: {g(count)}", f"Numerical integration: {g(num)}"]
    if lam is not None:
        assert i != j

        def jc_prob(t, x, y):
            e = np.exp(-lam * t)
            return e + (1 - e) / 4 if x == y else (1 - e) / 4

        if a != i and j != b and a != b:
            jc_count = (lam / 16) * (
                T + (2 / lam) * (np.exp(-lam * T) - 1) + T * np.exp(-lam * T)
            ) / (1 - np.exp(-lam * T))
            lines.append(f"Jukes-Cantor (lambda={g(lam)}): {g(jc_count)}")
        jc_num = float(
            np.sum(jc_prob(ts, a, i) * (lam / 4) * t_step * jc_prob(T - ts, j, b))
        ) / jc_prob(T, a, b)
        lines.append(f"Jukes-Cantor numerical (lambda={g(lam)}): {g(jc_num)}")
        lines.append(f"Rate(i->j): {g(model.sub_rate[0, i, j])}")
        for label, p in (
            ("Eigen: P(a->i|T/3)", eigen.sub_prob_matrix(T / 3)[0][a, i]),
            ("Eigen: P(j->b|2T/3)", eigen.sub_prob_matrix(2 * T / 3)[0][j, b]),
            ("Eigen: P(a->b|T)", sub[a, b]),
            ("JC exact: P(a->i|T/3)", jc_prob(T / 3, a, i)),
            ("JC exact: P(j->b|2T/3)", jc_prob(2 * T / 3, j, b)),
            ("JC exact: P(a->b|T)", jc_prob(T, a, b)),
        ):
            lines.append(f"{label}: {g(p)}")
    with open(os.path.join(ref_data, golden)) as f:
        assert_text_match("\n".join(lines) + "\n", f.read(), sig_figs=4)
