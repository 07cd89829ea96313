"""End-to-end CLI tests: the reference's testhist/testcount/testsum/testzerolen
golden commands (reference Makefile:304-331) run through `python -m
historian_tpu` and compared byte-for-byte."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args: list[str]) -> str:
    env = dict(os.environ)
    env["HISTORIAN_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [sys.executable, "-m", "historian_tpu", *args],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    return result.stdout


def golden(ref_data, name):
    with open(os.path.join(ref_data, name)) as f:
        return f.read()


def d(ref_data, name):
    return os.path.join(ref_data, name)


def test_recon_testcount(ref_data):
    out = run_cli(
        ["recon", "-careful", "-norefine", "-output", "fasta",
         "-model", d(ref_data, "testcount.jukescantor.json"),
         "-guide", d(ref_data, "testcount.fa"), "-tree", d(ref_data, "testcount.nh")]
    )
    assert out == golden(ref_data, "testcount.historian.fa")


def test_recon_nexus(ref_data):
    out = run_cli(
        ["recon", "-careful", "-norefine", "-output", "fasta",
         "-model", d(ref_data, "testnj.jukescantor.json"),
         "-nexus", d(ref_data, "testnexus.nex")]
    )
    assert out == golden(ref_data, "testnexus.hist.fa")


@pytest.mark.slow
def test_recon_pf16593_sampled(ref_data):
    out = run_cli(
        ["recon", "-careful", "-norefine", "-output", "fasta", "-profsamples", "100",
         "-guide", d(ref_data, "PF16593.testspan.fa"),
         "-model", d(ref_data, "testamino.json"),
         "-tree", d(ref_data, "PF16593.testspan.testnj.nh"), "-band", "10"]
    )
    assert out == golden(ref_data, "PF16593.testspan.testnj.historian.fa")


@pytest.mark.slow
def test_recon_full_pipeline(ref_data):
    """Unaligned seqs -> guide alignment -> banded recon, vs golden."""
    out = run_cli(
        ["recon", "-careful", "-norefine", "-output", "fasta", "-profsamples", "100",
         "-seqs", d(ref_data, "PF16593.fa"), "-tree", d(ref_data, "PF16593.nhx"),
         "-model", d(ref_data, "testamino.json"), "-nj"]
    )
    assert out == golden(ref_data, "PF16593.historian.fa")


def test_count_golden(ref_data):
    out = run_cli(
        ["count", "-careful", "-model", d(ref_data, "testcount.jukescantor.json"),
         "-recon", d(ref_data, "testcount.fa"), "-tree", d(ref_data, "testcount.nh")]
    )
    assert out == golden(ref_data, "testcount.out.json")


def test_count_with_ancestors(ref_data):
    out = run_cli(
        ["count", "-careful", "-model", d(ref_data, "testcount.jukescantor.json"),
         "-tree", d(ref_data, "testcount.nh"), "-recon", d(ref_data, "testcount.historian.fa")]
    )
    assert out == golden(ref_data, "testcount.count.json")


def test_count_mixture(ref_data):
    out = run_cli(
        ["count", "-careful", "-model", d(ref_data, "testrates.mix2.json"),
         "-recon", d(ref_data, "testcount.mix2.fa"), "-tree", d(ref_data, "testcount.mix2.nh")]
    )
    assert out == golden(ref_data, "testcount.mix2.count.json")


def test_sum_golden(ref_data):
    out = run_cli(["sum", d(ref_data, "testcount.out.json"), d(ref_data, "testcount.out.json")])
    assert out == golden(ref_data, "testcount.sum.json")


@pytest.mark.parametrize("case", ["zerolen", "zerolen2"])
def test_zerolen(ref_data, case):
    out = run_cli([d(ref_data, f"{case}.fa"), "-output", "fasta"])
    assert out == golden(ref_data, f"{case}.aligned.fa")


def test_version():
    out = run_cli(["version"])
    assert "historian-tpu" in out


def test_codon_generate_then_recon(tmp_path):
    """-codon end-to-end: simulate DNA under ECMunrest, reconstruct it."""
    tree = tmp_path / "t.nh"
    tree.write_text("((a:0.2,b:0.3)ab:0.1,(c:0.25,d:0.15)cd:0.2)root;\n")
    sim = run_cli(["generate", "-codon", "-preset", "ECMunrest", "-seed", "11", str(tree)])
    assert sim.startswith("# STOCKHOLM")
    stock = tmp_path / "sim.stock"
    stock.write_text(sim)
    out = run_cli(["recon", "-codon", "-preset", "ECMunrest", "-norefine",
                   "-output", "fasta", "-stockholm", str(stock)])
    rows: dict = {}
    name = None
    for ln in out.splitlines():
        if ln.startswith(">"):
            name = ln[1:]
            rows[name] = ""
        elif name:
            rows[name] += ln
    assert set("abcd") <= set(rows)
    for name, seq in rows.items():
        assert len(seq.replace("-", "")) % 3 == 0
        assert set(seq.lower()) <= set("acgt-*x")  # x = reference wildcard codon (ctok.cpp:179)


def test_fit_em_loglik_monotone(ref_data):
    """EM property: the per-iteration log-likelihood never decreases."""
    import re
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "historian_tpu", "fit", "-platform", "cpu", "-v2",
         "-model", d(ref_data, "testcount.jukescantor.json"),
         "-recon", d(ref_data, "testcount.historian.fa"),
         "-tree", d(ref_data, "testcount.nh")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr[-300:]
    lls = [float(m) for m in re.findall(r"EM iteration #\d+: log-likelihood = (\S+)", proc.stderr)]
    assert len(lls) >= 3
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9, (a, b)


@pytest.mark.slow
def test_every_documented_flag_is_handled(ref_data):
    """CLI robustness: every flag named in the help text parses without a
    traceback (clean run or clean one-line error, never a crash)."""
    import re
    import subprocess
    import sys

    help_text = subprocess.run(
        [sys.executable, "-m", "historian_tpu", "help"],
        capture_output=True, text=True,
    ).stderr
    flags = sorted(set(re.findall(r"(?<![\w/])-[a-z]+", help_text)))
    needs_value = {
        "-seqs": d(ref_data, "testcount.fa"), "-guide": d(ref_data, "testcount.fa"),
        "-nexus": d(ref_data, "testnexus.nex"), "-stockholm": d(ref_data, "cbs.stock"),
        "-tree": d(ref_data, "testcount.nh"), "-reroot": "root", "-model": d(ref_data, "testcount.jukescantor.json"),
        "-preset": "jc", "-insrate": "0.01", "-delrate": "0.01", "-insextprob": "0.5",
        "-delextprob": "0.5", "-gaprate": "0.02", "-gapextprob": "0.5", "-inslen": "2",
        "-dellen": "2", "-gaplen": "2", "-subscale": "1", "-indelscale": "1", "-scale": "1",
        "-gamma": "2", "-shape": "1.0", "-savemodel": "/dev/null", "-band": "10",
        "-profsamples": "2", "-profminpost": "0.1", "-profmaxstates": "50",
        "-profminlen": "1", "-profmaxlen": "100", "-profmaxmem": "1",
        "-savedot": "/dev/null", "-saveguide": "/dev/null", "-output": "fasta",
        "-samples": "1", "-trace": "/dev/null", "-kmatch": "6", "-kmatchn": "2",
        "-kmatchband": "32", "-kmatchmb": "16", "-seed": "1", "-log": "x",
        "-platform": "cpu", "-counts": d(ref_data, "testcount.count.json"),
        "-mininc": "0.01", "-maxiter": "2", "-rootlen": "10", "-root": "root",
        "-profile": "/tmp/_cli_flag_profile", "-v": None,
    }
    skip = {"-fast", "-careful", "-mcmc", "-v"}  # aliases/slow paths covered elsewhere
    base = ["recon", "-platform", "cpu", "-norefine", "-output", "fasta",
            "-model", d(ref_data, "testcount.jukescantor.json"),
            "-guide", d(ref_data, "testcount.fa"), "-tree", d(ref_data, "testcount.nh")]
    from concurrent.futures import ThreadPoolExecutor

    def run_flag(flag):
        extra = [flag] + ([needs_value[flag]] if needs_value.get(flag) else [])
        proc = subprocess.run(
            [sys.executable, "-m", "historian_tpu"] + base + extra,
            capture_output=True, text=True, timeout=300,
        )
        return flag, proc.stderr

    todo = [f for f in flags
            if f not in skip and f not in ("-platform", "-model", "-guide", "-tree", "-output", "-norefine")]
    with ThreadPoolExecutor(max_workers=6) as pool:
        for flag, err in pool.map(run_flag, todo):
            assert "Traceback" not in err, (flag, err[-400:])


def test_verbosity_flag_forms():
    """-v/-verbose/-vv.../-vN all parse (reference logger.cpp:43-75)."""
    from historian_tpu.utils.logging import Logger

    for args, want in [
        (["-v"], 1), (["-verbose"], 1), (["-vv"], 2), (["-vvvvv"], 5),
        (["-v3"], 3), (["-v10"], 10), (["-v", "-v4"], 4),
    ]:
        lg = Logger()
        rest = lg.parse_args(args + ["keep"])
        assert rest == ["keep"], (args, rest)
        assert lg.verbosity == want, (args, lg.verbosity)
