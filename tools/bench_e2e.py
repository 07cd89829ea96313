#!/usr/bin/env python
"""End-to-end wall-clock: the flagship gp120 workloads, host vs TPU.

Measures the BASELINE.md north-star commands as real CLI subprocesses:

  recon:  python -m historian_tpu recon [preset] /root/reference/data/gp120.fa
          (19-node tree, ~780 columns -- the reference's flagship example,
          /root/reference/README.md:35-43)
  count:  python -m historian_tpu count -model doc/sim/gp120.json
          -recon doc/sim/gp120.recon.fa -tree data/gp120.tree.nh
          (complex-spectrum eigencounts, the fit/count E-step hot loop,
          /root/reference/src/forward.cpp:1183-1214)

Protocol (this host's demand paging drifts ~2.3x between phases; the
remote-TPU tunnel's compile queue is erratic -- CLAUDE.md): platforms run
INTERLEAVED cpu/tpu x N so both see the same host weather, each command's
wall is the best of N (steady-state: compile caches warm after run 1),
and a run only counts if it exits 0 and its stdout parses as payload
(alignment with #=GF LP, or counts JSON).  Writes E2E_TPU.json at the
repo root; bench.py folds it into its extras as `end_to_end_recorded`.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF = "/root/reference"

WORKLOADS = {
    "recon_gp120": ["recon", f"{REF}/data/gp120.fa"],
    "recon_gp120_fast": ["recon", "-fast", f"{REF}/data/gp120.fa"],
    "count_gp120": [
        "count", "-model", f"{REF}/doc/sim/gp120.json",
        "-stockrecon", f"{REF}/doc/sim/gp120.recon.fa",
    ],
    # compute-dominated flagship: 8 taxa x ~3000 aa (tools-generated,
    # committed at tests/data/), UNBANDED merges -- every merge exceeds
    # the device-win crossover (~4e7 state-cells), so this is the
    # workload where the device DP path and the cpp anchor measure the
    # COMPUTE story rather than boot/guide overhead (gp120's merges are
    # ~1e5-cell and boot-bound; see cpp_equiv_note there)
    "recon_long8": [
        "recon", "-noband", "-model", f"{REF}/data/testamino.json",
        "-tree", f"{REPO}/tests/data/long8.nh", f"{REPO}/tests/data/long8.fa",
    ],
    # deeper compute flagship: 6 taxa x ~6000 aa, unbanded -- every
    # merge (leaf 6000^2 up to root ~9000^2 grids) fits the resident
    # plane budget, so the device route carries the whole merge loop
    "recon_long6x6k": [
        "recon", "-noband", "-model", f"{REF}/data/testamino.json",
        "-tree", f"{REPO}/tests/data/long6.nh", f"{REPO}/tests/data/long6.fa",
    ],
    # all-chain deep flagship: 12 taxa x ~6000 aa with -fast's best-trace
    # (chain) profiles and the band released -- all 11 merges are
    # chain x chain and device-resident, the regime the TPU design is
    # built for (reference's own headline preset, paper.tex:219-220)
    "recon_long12_fast": [
        "recon", "-fast", "-noband", "-model", f"{REF}/data/testamino.json",
        "-tree", f"{REPO}/tests/data/long12.nh", f"{REPO}/tests/data/long12.fa",
    ],
    # depth flagship: 8 taxa x ~11000 aa, -fast -noband -- per-merge DP
    # work grows ~4x over the 6k workloads (quadratic in length) while
    # the TPU route's wall grows sub-linearly (the column scan is
    # length-linear and the fixed costs amortize), so this is the
    # workload that shows the accelerator's asymptotic margin over the
    # single-core C++ anchor (BASELINE.json north star)
    "recon_long8x11k_fast": [
        "recon", "-fast", "-noband", "-model", f"{REF}/data/testamino.json",
        "-tree", f"{REPO}/tests/data/long8x12k.nh",
        f"{REPO}/tests/data/long8x12k.fa",
    ],
}


def tunnel_probe_ms() -> float | None:
    """Attach + steady-RTT probe in a fresh subprocess: the weather
    stamp recorded next to every tpu wall.  A wall measured at
    rtt ~30ms is steady-state; one next to rtt in the hundreds/thousands
    of ms (or a failed probe) is tunnel congestion, not code."""
    code = (
        "import time, numpy as np\n"
        "import jax\n"
        "t0 = time.perf_counter()\n"
        "np.asarray(jax.device_put(np.zeros(64, np.float32)))\n"
        "attach = time.perf_counter() - t0\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(3):\n"
        "    np.asarray(jax.device_put(np.zeros(64, np.float32)))\n"
        "rtt = (time.perf_counter() - t0) / 3 * 1e3\n"
        "print(attach, rtt)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=120, env=env,
        )
        attach_s, rtt_ms = (float(v) for v in proc.stdout.strip().splitlines()[-1].split())
        # a congested ATTACH (measured 60s while steady RTT read 27ms the
        # same minute) taxes every fresh process ~attach seconds: fold it
        # into the health number so the weather gate sees it
        return round(rtt_ms if attach_s < 5.0 else max(rtt_ms, attach_s * 1e3), 1)
    except Exception:
        return None


def run_one(args: list[str], platform: str) -> tuple[float, str]:
    """One timed subprocess run; returns (wall_s, stdout).  Raises on a
    non-zero exit or non-payload output (a fast failure must never be
    recorded as a fast run)."""
    cmd = [sys.executable, "-m", "historian_tpu", *args, "-platform", platform]
    t0 = time.perf_counter()
    proc = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    wall = time.perf_counter() - t0
    assert proc.returncode == 0, (platform, args[0], proc.stderr[-2000:])
    out = proc.stdout
    if args[0] == "recon":
        assert "# STOCKHOLM" in out and "#=GF LP" in out, out[:500]
    else:
        # counts JSON replicates the reference's missing-comma quirk
        # (tests/golden.py load_lenient_json), so strict json.loads fails
        # by design -- check the payload keys structurally instead
        assert '"alphabet"' in out and '"indel"' in out and '"sub"' in out, out[:200]
    return wall, out


def lp_of(out: str) -> float | None:
    m = re.search(r"#=GF LP\s+(-?[0-9.eE+]+)", out)
    return float(m.group(1)) if m else None


def cpp_equiv(args: list[str], best_wall_s: float) -> dict:
    """Anchor the BASELINE.json north star: record the actual merge
    shapes of one instrumented CPU run (HISTORIAN_MERGE_SHAPES), then
    run the single-core C++ banded fill over exactly those shapes
    (tools/bench_baseline.cpp recon mode, best of 3).  Returns
    cpp_equiv_s (what the reference's single-threaded merge loop would
    spend on this reconstruction's DP alone -- conservative: fill only)
    and the end-to-end ratio vs our best recorded wall."""
    import tempfile

    shapes = tempfile.NamedTemporaryFile(
        mode="r", suffix=".shapes", prefix="histmerge.", delete=False
    )
    try:
        env = dict(os.environ)
        env["HISTORIAN_MERGE_SHAPES"] = shapes.name
        cmd = [sys.executable, "-m", "historian_tpu", *args, "-platform", "cpu"]
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600, cwd=REPO, env=env,
        )
        assert proc.returncode == 0, proc.stderr[-500:]
        lines = open(shapes.name).read().strip().splitlines()
        assert lines, "no merge shapes recorded"
        src = os.path.join(HERE, "bench_baseline.cpp")
        exe = os.path.join(HERE, "bench_baseline")
        if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-o", exe, src],
                check=True, capture_output=True,
            )
        best_ideal = best_ref = None
        for _ in range(3):
            out = subprocess.run(
                [exe, "recon", shapes.name],
                check=True, capture_output=True, text=True, timeout=3600,
            )
            ideal, ref_shaped = (float(v) for v in out.stdout.split())
            best_ideal = ideal if best_ideal is None else min(best_ideal, ideal)
            best_ref = ref_shaped if best_ref is None else min(best_ref, ref_shaped)
        return {
            "merge_shapes": [
                dict(zip(("x", "y", "band_state_cells"), map(int, ln.split())))
                for ln in lines
            ],
            "cpp_ideal_s": round(best_ideal, 3),
            "cpp_equiv_s": round(best_ref, 3),
            "vs_cpp_equiv": round(best_ref / best_wall_s, 3),
            "cpp_equiv_note": (
                "single-core C++ banded fill over the recorded merge shapes "
                "(bench_baseline.cpp recon mode).  cpp_ideal_s = dense-array "
                "linear-space lower bound; cpp_equiv_s = reference-shaped "
                "(map cellStorage + log-space absorb, forward.h:22/112-124). "
                "DP fill only -- conservative: the reference's full recon "
                "also pays guide/tree/traceback, and OUR wall includes "
                "~2.3s jax boot.  On boot-bound inputs (gp120) the DP is "
                "not the bottleneck for either side; the long workloads "
                "are the compute story"
            ),
        }
    finally:
        os.unlink(shapes.name)


def main() -> None:
    n = int(os.environ.get("E2E_REPS", "3"))
    names = sys.argv[1:] or list(WORKLOADS)
    results: dict[str, dict] = {}
    for name in names:
        args = WORKLOADS[name]
        walls: dict[str, list[float]] = {"cpu": [], "tpu": []}
        probes: list[float | None] = []
        lps: dict[str, float | None] = {}
        # weather-seeking: congestion phases on the remote tunnel last
        # minutes to HOURS (kernel stacks show the process parked in a
        # single tcp_recvmsg); a wall measured then records the queue,
        # not the code.  Before each tpu rep, wait (bounded by
        # E2E_WEATHER_WAIT_S, default 20 min per rep) for the probe to
        # show a steady tunnel; if it never clears, run anyway -- the
        # recorded rtt stamp marks the wall as weather-bound.
        weather_budget = float(os.environ.get("E2E_WEATHER_WAIT_S", "1200"))
        for rep in range(n):
            for platform in ("cpu", "tpu"):  # interleaved: same host weather
                if platform == "tpu":
                    waited = 0.0
                    rtt = tunnel_probe_ms()
                    while (rtt is None or rtt > 150.0) and waited < weather_budget:
                        print(f"{name} rep{rep}: tunnel congested "
                              f"(rtt={rtt}); waiting...", file=sys.stderr)
                        time.sleep(120)
                        waited += 120
                        rtt = tunnel_probe_ms()
                    probes.append(rtt)
                wall, out = run_one(args, platform)
                walls[platform].append(round(wall, 2))
                lps[platform] = lp_of(out)
                print(f"{name} {platform} rep{rep}: {wall:.2f}s", file=sys.stderr)
        entry = {
            "command": "historian_tpu " + " ".join(args),
            "cpu_best_s": min(walls["cpu"]),
            "tpu_best_s": min(walls["tpu"]),
            "cpu_walls_s": walls["cpu"],
            "tpu_walls_s": walls["tpu"],
            "tpu_probe_rtt_ms": probes,
            "tpu_vs_cpu": round(min(walls["cpu"]) / min(walls["tpu"]), 3),
        }
        if lps.get("cpu") is not None:
            entry["lp_cpu"] = lps["cpu"]
            entry["lp_tpu"] = lps["tpu"]
        if name in ("recon_gp120", "recon_long8", "recon_long6x6k",
                    "recon_long12_fast", "recon_long8x11k_fast"):
            try:
                entry.update(cpp_equiv(args, min(min(walls["cpu"]), min(walls["tpu"]))))
            except Exception as e:  # anchor failures must not lose the walls
                entry["cpp_equiv_error"] = f"{type(e).__name__}: {e}"[:200]
        results[name] = entry
        print(json.dumps({name: entry}), file=sys.stderr)
        # write incrementally: a crash or timeout on a later workload must
        # not discard completed measurements
        path = os.path.join(REPO, "E2E_TPU.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        existing.update(results)
        existing["host"] = os.uname().nodename
        with open(path, "w") as f:
            json.dump(existing, f, indent=1)
    print(json.dumps(existing))


if __name__ == "__main__":
    main()
