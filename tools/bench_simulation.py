#!/usr/bin/env python
"""Simulation-based rate-recovery benchmark (the doc/sim analogue).

Mirrors the reference's doc/sim/Makefile loop: simulate alignments down
a tree under known indel rates, then re-estimate the rates and report
the recovery ratio est/true (the reference's headline table,
doc/sim/gp120.1-100.summary: true-alignment 0.90, Historian 0.70).

Two estimates are reported per replicate set:
- "true-alignment": EM fit given the simulated alignment + tree
  (upper bound -- measures count extraction + M-step only);
- "reconstructed": degap, reconstruct with the CLI, then fit
  (the full pipeline the reference scores).

Usage: python tools/bench_simulation.py [-platform cpu] [-n replicates]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TREE = "((((a:0.3,b:0.3):0.2,(c:0.4,d:0.4):0.1):0.2,(e:0.5,f:0.5):0.2):0.1,(g:0.6,h:0.6):0.2)root;"


def run(args: list[str]) -> str:
    proc = subprocess.run(
        [sys.executable, "-m", "historian_tpu"] + args,
        capture_output=True, text=True, cwd=REPO,
    )
    if proc.returncode != 0:
        sys.exit(f"command failed: {' '.join(args)}\n{proc.stderr.strip().splitlines()[-1]}")
    return proc.stdout


def main() -> None:
    import json

    args = sys.argv[1:]
    platform = []
    if "-platform" in args:
        i = args.index("-platform")
        platform = args[i : i + 2]
    n = int(args[args.index("-n") + 1]) if "-n" in args else 5
    true_ins = true_del = 0.02

    model_flags = ["-preset", "lg", "-insrate", str(true_ins), "-delrate", str(true_del),
                   "-inslen", "3", "-dellen", "3"]
    est_true, est_recon = [], []
    with tempfile.TemporaryDirectory() as tmp:
        tree_path = os.path.join(tmp, "t.nh")
        with open(tree_path, "w") as f:
            f.write(TREE + "\n")
        for rep in range(n):
            stock = run(["generate"] + platform + model_flags + ["-seed", str(100 + rep), tree_path])
            sim_path = os.path.join(tmp, f"sim{rep}.stock")
            with open(sim_path, "w") as f:
                f.write(stock)

            # fit on the true alignment (tree embedded in the Stockholm)
            fitted = json.loads(run(
                ["fit"] + platform + ["-preset", "lg", "-fixsubrates", "-stockrecon", sim_path]
            ))
            est_true.append((fitted["insrate"], fitted["delrate"]))

            # full pipeline: degap, reconstruct, fit
            seq_path = os.path.join(tmp, f"seqs{rep}.fa")
            from historian_tpu.core.stockholm import Stockholm

            leaves = [s for s in Stockholm.read(sim_path).gapped if not s.name.startswith("node")]
            with open(seq_path, "w") as f:
                for s in leaves:
                    f.write(f">{s.name}\n{s.seq.replace('-', '').replace('.', '')}\n")
            recon_path = os.path.join(tmp, f"recon{rep}.stock")
            with open(recon_path, "w") as f:
                f.write(run(["recon"] + platform + ["-preset", "lg", "-norefine",
                             "-output", "stockholm", seq_path]))
            fitted = json.loads(run(
                ["fit"] + platform + ["-preset", "lg", "-fixsubrates", "-stockrecon", recon_path]
            ))
            est_recon.append((fitted["insrate"], fitted["delrate"]))
            print(f"rep {rep}: true-align ins/del = {est_true[-1][0]:.4f}/{est_true[-1][1]:.4f}  "
                  f"recon ins/del = {est_recon[-1][0]:.4f}/{est_recon[-1][1]:.4f}")

    def ratio(pairs):
        mean_ins = sum(p[0] for p in pairs) / len(pairs)
        mean_del = sum(p[1] for p in pairs) / len(pairs)
        return (mean_ins / true_ins + mean_del / true_del) / 2

    print(f"recovery ratio (est/true): true-alignment {ratio(est_true):.2f}  "
          f"reconstructed {ratio(est_recon):.2f}")


if __name__ == "__main__":
    main()
