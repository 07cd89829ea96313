"""Two-process DCN dryrun: jax.distributed across two localhost CPU
processes (4 virtual devices each -> an 8-device global mesh), running
the production `count -mesh` path on reference data.

This is the cross-machine analogue of the reference's file MapReduce
(README.md:201-208): each process computes its dp shard of the E-step
and an in-jit psum reduces over DCN.  Counts must match the
single-process result (the count algebra is associative; float
reassociation only), and both processes must agree exactly."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_count(ref_data, extra_env, mesh: int, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(
        HISTORIAN_PLATFORM="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    env.update(extra_env)
    return subprocess.Popen(
        [
            sys.executable, "-m", "historian_tpu", "count",
            "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
            "-recon", os.path.join(ref_data, "testcount.fa"),
            "-tree", os.path.join(ref_data, "testcount.nh"),
            "-mesh", str(mesh),
        ],
        env=env, cwd="/root/repo", text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


def _run_cli(args, extra_env, timeout=600):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.update(
        HISTORIAN_PLATFORM="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, "-m", "historian_tpu", *args],
        env=env, cwd="/root/repo", text=True,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
    )


@pytest.mark.slow
def test_two_process_dataset_sharding(ref_data, tmp_path):
    """count with TWO datasets across two processes: each process counts
    its round-robin shard and the partials allreduce -- the in-memory
    form of `historian count f1 & count f2; historian sum` (the
    reference's README.md:201-208 recipe)."""
    import re

    fa = open(os.path.join(ref_data, "testcount.fa")).read()
    nh = open(os.path.join(ref_data, "testcount.nh")).read().strip()
    stk_rows = "\n".join(
        f"{name} {seq}"
        for name, seq in re.findall(r">(\S+)\n([^>]+)", fa)
        for seq in [seq.replace("\n", "")]
    )
    a = tmp_path / "a.stk"
    b = tmp_path / "b.stk"
    a.write_text(f"# STOCKHOLM 1.0\n#=GF NH {nh}\n{stk_rows}\n//\n")
    # second dataset: same rows renamed so the counts differ from 2x(a)
    b.write_text(
        f"# STOCKHOLM 1.0\n#=GF NH {nh}\n{stk_rows.replace('G', 'A', 1)}\n//\n"
    )
    args = [
        "count",
        "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
        "-stockrecon", str(a), "-stockrecon", str(b),
    ]
    single = _run_cli(args, {})
    out_single, err_single = single.communicate(timeout=600)
    assert single.returncode == 0, err_single[-2000:]

    port = _free_port()
    common = {
        "HISTORIAN_COORDINATOR": f"127.0.0.1:{port}",
        "HISTORIAN_NUM_PROCESSES": "2",
    }
    p0 = _run_cli(args, {**common, "HISTORIAN_PROCESS_ID": "0"})
    p1 = _run_cli(args, {**common, "HISTORIAN_PROCESS_ID": "1"})
    out0, err0 = p0.communicate(timeout=600)
    out1, err1 = p1.communicate(timeout=600)
    assert p0.returncode == 0, err0[-3000:]
    assert p1.returncode == 0, err1[-3000:]

    def payload(s: str) -> str:
        return s[s.index("{"):]

    assert payload(out0) == payload(out1)
    from tests.golden import assert_text_match

    assert_text_match(payload(out0), payload(out_single), sig_figs=6)


@pytest.mark.slow
def test_two_process_count_matches_single(ref_data):
    single = _run_count(ref_data, {}, mesh=4)
    out_single, err_single = single.communicate(timeout=600)
    assert single.returncode == 0, err_single[-2000:]

    port = _free_port()
    common = {
        "HISTORIAN_COORDINATOR": f"127.0.0.1:{port}",
        "HISTORIAN_NUM_PROCESSES": "2",
    }
    p0 = _run_count(ref_data, {**common, "HISTORIAN_PROCESS_ID": "0"}, mesh=8)
    p1 = _run_count(ref_data, {**common, "HISTORIAN_PROCESS_ID": "1"}, mesh=8)
    out0, err0 = p0.communicate(timeout=600)
    out1, err1 = p1.communicate(timeout=600)
    assert p0.returncode == 0, err0[-3000:]
    assert p1.returncode == 0, err1[-3000:]

    def payload(s: str) -> str:
        # Gloo's connection chatter shares stdout; the counts JSON starts
        # at the first brace
        return s[s.index("{"):]

    # psum leaves every process with the same replicated totals
    assert payload(out0) == payload(out1)

    from tests.golden import assert_text_match

    assert_text_match(payload(out0), payload(out_single), sig_figs=4)


@pytest.mark.slow
def test_two_process_mcmc_dataset_sharding(ref_data, tmp_path):
    """mcmc with TWO datasets across two processes: per-dataset chains
    are independent, so each sharded dataset's trajectory must equal a
    single-process run of that dataset ALONE with the same seed, and
    the post-run allgather must leave every process with identical
    replicated output."""
    import re

    fa = open(os.path.join(ref_data, "testcount.fa")).read()
    nh = open(os.path.join(ref_data, "testcount.nh")).read().strip()
    stk_rows = "\n".join(
        f"{name} {seq}"
        for name, seq in re.findall(r">(\S+)\n([^>]+)", fa)
        for seq in [seq.replace("\n", "")]
    )
    a = tmp_path / "a.stk"
    b = tmp_path / "b.stk"
    a.write_text(f"# STOCKHOLM 1.0\n#=GF NH {nh}\n{stk_rows}\n//\n")
    b.write_text(
        f"# STOCKHOLM 1.0\n#=GF NH {nh}\n{stk_rows.replace('G', 'A', 1)}\n//\n"
    )
    model = os.path.join(ref_data, "testcount.jukescantor.json")
    base = ["mcmc", "-model", model, "-samples", "2", "-seed", "7", "-fixguide"]

    singles = []
    for f in (a, b):
        p = _run_cli([*base, "-stockholm", str(f)], {})
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, err[-3000:]
        singles.append(out)

    port = _free_port()
    common = {
        "HISTORIAN_COORDINATOR": f"127.0.0.1:{port}",
        "HISTORIAN_NUM_PROCESSES": "2",
    }
    args = [*base, "-stockholm", str(a), "-stockholm", str(b)]
    p0 = _run_cli(args, {**common, "HISTORIAN_PROCESS_ID": "0"})
    p1 = _run_cli(args, {**common, "HISTORIAN_PROCESS_ID": "1"})
    out0, err0 = p0.communicate(timeout=600)
    out1, err1 = p1.communicate(timeout=600)
    assert p0.returncode == 0, err0[-3000:]
    assert p1.returncode == 0, err1[-3000:]

    def payload(s: str) -> str:
        return s[s.index("# STOCKHOLM"):]

    # allgather replication: both processes hold every dataset's winner
    assert payload(out0) == payload(out1)
    # independence: the sharded run reproduces the single-dataset runs
    assert payload(out0) == payload(singles[0]) + payload(singles[1])
