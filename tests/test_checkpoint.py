"""Checkpoint/resume for EM fit and MCMC (utils/checkpoint).

The invariant: a run that is interrupted and resumed from its snapshot
produces EXACTLY the output of the uninterrupted run -- snapshots carry
the mt19937 state and full-precision model/tree floats, so the resumed
trajectory is the same trajectory.
"""

import json
import os
import subprocess
import sys

import pytest


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["HISTORIAN_PLATFORM"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "historian_tpu", *args],
        capture_output=True, text=True, timeout=600, env=env, cwd="/root/repo",
    )


def _ungapped_copy(src, dst):
    rows = open(src).read().split(">")
    with open(dst, "w") as f:
        for r in rows:
            if not r.strip():
                continue
            name, seq = r.split("\n", 1)
            f.write(f">{name}\n{seq.replace('-', '').replace(chr(10), '')}\n")


@pytest.mark.slow
def test_fit_checkpoint_resume_reproduces_uninterrupted(ref_data, tmp_path):
    seqs = str(tmp_path / "seqs.fa")
    _ungapped_copy(os.path.join(ref_data, "testcount.fa"), seqs)
    base = [
        "fit", "-fixsubrates",
        "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
        "-tree", os.path.join(ref_data, "testcount.nh"),
        "-seqs", seqs,
        "-maxiter", "3", "-seed", "7",
    ]
    full = _run_cli(base, tmp_path)
    assert full.returncode == 0, full.stderr[-2000:]

    # interrupted run: 1 EM iteration, snapshot left behind
    ck = str(tmp_path / "fit.ckpt.json")
    part = _run_cli(base[:-4] + ["-maxiter", "1", "-seed", "7", "-checkpoint", ck], tmp_path)
    assert part.returncode == 0, part.stderr[-2000:]
    assert os.path.exists(ck)
    st = json.load(open(ck))
    assert st["command"] == "fit" and st["iteration"] == 0

    # resume: same command line as the full run, + the checkpoint
    resumed = _run_cli(base + ["-checkpoint", ck, "-v"], tmp_path)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert "Resuming EM" in resumed.stderr
    assert resumed.stdout == full.stdout


@pytest.mark.slow
def test_mcmc_checkpoint_resume_reproduces_uninterrupted(ref_data, tmp_path):
    base = [
        "mcmc", "-fast", "-norefine", "-samples", "2", "-seed", "11",
        "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
        "-tree", os.path.join(ref_data, "testcount.nh"),
        "-guide", os.path.join(ref_data, "testcount.fa"),
        "-output", "fasta",
    ]
    full = _run_cli(base, tmp_path)
    assert full.returncode == 0, full.stderr[-2000:]

    # run with snapshots every 3 steps; the final snapshot is mid-run
    ck = str(tmp_path / "mcmc.ckpt.json")
    first = _run_cli(base + ["-checkpoint", ck, "-ckptevery", "3"], tmp_path)
    assert first.returncode == 0, first.stderr[-2000:]
    assert first.stdout == full.stdout  # snapshots must not perturb the run
    assert os.path.exists(ck)
    st = json.load(open(ck))
    assert st["command"] == "mcmc" and st["step"] >= 3

    # resume from the leftover mid-run snapshot: identical final output
    resumed = _run_cli(base + ["-checkpoint", ck, "-ckptevery", "3", "-v"], tmp_path)
    assert resumed.returncode == 0, resumed.stderr[-2000:]
    assert "Resuming MCMC" in resumed.stderr
    assert resumed.stdout == full.stdout


@pytest.mark.slow
def test_checkpoint_for_different_inputs_ignored(ref_data, tmp_path):
    """A leftover snapshot on the same -checkpoint path but written for
    DIFFERENT input sequences must start fresh (with a warning), never
    silently resume the stale model (round-2 advisor finding)."""
    seqs_a = str(tmp_path / "a.fa")
    seqs_b = str(tmp_path / "b.fa")
    _ungapped_copy(os.path.join(ref_data, "testcount.fa"), seqs_a)
    # same names, different residues
    rows = open(seqs_a).read()
    open(seqs_b, "w").write(rows.replace("A", "G", 3))
    ck = str(tmp_path / "fit.ckpt.json")
    base = [
        "fit", "-fixsubrates",
        "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
        "-tree", os.path.join(ref_data, "testcount.nh"),
        "-maxiter", "2", "-seed", "7", "-checkpoint", ck,
    ]
    first = _run_cli(base + ["-seqs", seqs_a], tmp_path)
    assert first.returncode == 0, first.stderr[-2000:]
    assert os.path.exists(ck)

    second = _run_cli(base + ["-seqs", seqs_b, "-v"], tmp_path)
    assert second.returncode == 0, second.stderr[-2000:]
    assert "Resuming" not in second.stderr
    assert "different inputs" in second.stderr

    # and a matching rerun DOES resume
    third = _run_cli(base + ["-seqs", seqs_b, "-v"], tmp_path)
    assert third.returncode == 0, third.stderr[-2000:]
    assert "Resuming EM" in third.stderr


def test_stale_checkpoint_ignored(ref_data, tmp_path):
    """A snapshot from a different command must not poison a run."""
    ck = str(tmp_path / "x.ckpt.json")
    json.dump({"format": 1, "command": "mcmc", "step": 5}, open(ck, "w"))
    base = [
        "fit", "-fixsubrates",
        "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
        "-tree", os.path.join(ref_data, "testcount.nh"),
        "-seqs", os.path.join(ref_data, "testcount.fa"),
        "-maxiter", "1", "-seed", "7", "-checkpoint", ck,
    ]
    out = _run_cli(base, tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Resuming" not in out.stderr
    st = json.load(open(ck))
    assert st["command"] == "fit"  # overwritten with fresh fit state
