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
}


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


def main() -> None:
    n = int(os.environ.get("E2E_REPS", "3"))
    names = sys.argv[1:] or list(WORKLOADS)
    results: dict[str, dict] = {}
    for name in names:
        args = WORKLOADS[name]
        walls: dict[str, list[float]] = {"cpu": [], "tpu": []}
        lps: dict[str, float | None] = {}
        for rep in range(n):
            for platform in ("cpu", "tpu"):  # interleaved: same host weather
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
            "tpu_vs_cpu": round(min(walls["cpu"]) / min(walls["tpu"]), 3),
        }
        if lps.get("cpu") is not None:
            entry["lp_cpu"] = lps["cpu"]
            entry["lp_tpu"] = lps["tpu"]
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
