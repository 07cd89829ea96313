#!/usr/bin/env python
"""Simulation-based rate-recovery benchmark (the doc/sim analogue).

Mirrors the reference's doc/sim/Makefile gp120 protocol exactly
(doc/sim/Makefile:44-100; published summary doc/sim/gp120.1-100.summary:
ma 0.90, hist 0.70):

- simulate:  generate -preset dayhoff -gaprate 0.028 -gapextprob 0.68
             <gp120 tree> -rootlen 500        (rates from doc/sim/gp120.json:
             (insrate+delrate)/2 = 0.028, harmonic-mean extprob = 0.68)
- "ma":      fit -fast -fixsubrates -band 1 on the TRUE alignment
             (all rows incl. ancestors, NJ tree -- %.ma.json recipe)
- "hist":    fit -fast -fixsubrates on the unaligned leaves
             (EM re-reconstructs each iteration -- %.hist.json recipe)

Reported per mode: mean(est_ins/true), mean(est_del/true).

Usage: python tools/bench_simulation.py [-platform cpu] [-n replicates]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GP120_TREE = "/root/reference/data/gp120.tree.nh"
TRUE_RATE = 0.028      # -gaprate: both insrate and delrate
TRUE_EXT = 0.68        # -gapextprob
ROOT_LEN = 500


def run(args: list[str]) -> str:
    proc = subprocess.run(
        [sys.executable, "-m", "historian_tpu"] + args,
        capture_output=True, text=True, cwd=REPO,
    )
    if proc.returncode != 0:
        sys.exit(f"command failed: {' '.join(args)}\n{proc.stderr.strip().splitlines()[-1]}")
    return proc.stdout


def main() -> None:
    args = sys.argv[1:]
    platform = []
    if "-platform" in args:
        i = args.index("-platform")
        platform = args[i : i + 2]
    n = int(args[args.index("-n") + 1]) if "-n" in args else 5

    sim_flags = ["-preset", "dayhoff", "-gaprate", str(TRUE_RATE),
                 "-gapextprob", str(TRUE_EXT), "-rootlen", str(ROOT_LEN)]
    est_ma, est_hist = [], []
    with tempfile.TemporaryDirectory() as tmp:
        for rep in range(n):
            stock = run(["generate"] + platform + sim_flags
                        + ["-seed", str(1000 + rep), GP120_TREE])
            sim_path = os.path.join(tmp, f"sim{rep}.stock")
            with open(sim_path, "w") as f:
                f.write(stock)

            from historian_tpu.core.stockholm import Stockholm

            rows = Stockholm.read(sim_path).gapped
            ma_path = os.path.join(tmp, f"sim{rep}.ma.fa")
            with open(ma_path, "w") as f:
                for s in rows:
                    f.write(f">{s.name}\n{s.seq}\n")
            leaf_path = os.path.join(tmp, f"sim{rep}.leaf.fa")
            with open(leaf_path, "w") as f:
                for s in rows:
                    if not s.name.startswith("node"):
                        f.write(f">{s.name}\n{s.seq.replace('-', '').replace('.', '')}\n")

            # "ma": true alignment (ancestors included), NJ tree, band 1
            fitted = json.loads(run(
                ["fit"] + platform
                + ["-fast", "-fixsubrates", "-band", "1", ma_path]
            ))
            est_ma.append((fitted["insrate"], fitted["delrate"]))

            # "hist": unaligned leaves, EM with internal reconstruction
            fitted = json.loads(run(
                ["fit"] + platform + ["-fast", "-fixsubrates", leaf_path]
            ))
            est_hist.append((fitted["insrate"], fitted["delrate"]))
            print(f"rep {rep}: ma ins/del = {est_ma[-1][0]:.4f}/{est_ma[-1][1]:.4f}  "
                  f"hist ins/del = {est_hist[-1][0]:.4f}/{est_hist[-1][1]:.4f}",
                  flush=True)

    def ratios(pairs):
        mi = sum(p[0] for p in pairs) / len(pairs) / TRUE_RATE
        md = sum(p[1] for p in pairs) / len(pairs) / TRUE_RATE
        return mi, md

    ma_i, ma_d = ratios(est_ma)
    h_i, h_d = ratios(est_hist)
    print(f"recovery est/true -- ma: ins {ma_i:.2f} del {ma_d:.2f} "
          f"(reference published 0.90/0.90); "
          f"hist: ins {h_i:.2f} del {h_d:.2f} (reference published 0.70/0.70)")


if __name__ == "__main__":
    main()
