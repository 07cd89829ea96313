#!/usr/bin/env python
"""Per-round accuracy tracker (VERDICT r4 #8).

Regenerates ONE machine-readable accuracy record per round so quality
regressions surface round-over-round the way perf regressions do:

- SPS/TCS realignment scores (tools/bench_accuracy.py protocol: degap
  the reference alignment, realign with `recon`, score with the
  qscore metrics) for the standing corpus:
    PF16593.historian.fa   (reference's own output; expected ~1.0)
    cbs.stock, Lysine.stock (hard families, unanchored -- tracked for
                             drift, not absolute truth)
    doc/sim/gp120.recon.fa (reference's -fast reconstruction)
- simulation rate-recovery ratios (tools/bench_simulation.py protocol,
  doc/sim/Makefile analogue): ma and hist ins/del means over -n reps.

Writes ACCURACY_r{N}.json at the repo root and prints a diff against
the previous round's file when one exists.

Usage: python tools/track_accuracy.py -round 5 [-n 12] [-platform cpu]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.score_alignment import read_alignment, score

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

CORPUS = {
    "PF16593": (f"{REF}/data/PF16593.historian.fa", []),
    "PF16593_fast": (f"{REF}/data/PF16593.historian.fa", ["-fast"]),
    "cbs": (f"{REF}/data/cbs.stock", []),
    "Lysine": (f"{REF}/data/Lysine.stock", []),
    "gp120_fast": (f"{REF}/doc/sim/gp120.recon.fa", ["-fast"]),
}


def score_case(ref_path: str, mode: list[str], platform: list[str]):
    ref = read_alignment(ref_path)
    ref = {n: r for n, r in ref.items() if not n.startswith("(")}
    with tempfile.TemporaryDirectory() as tmp:
        seq_path = os.path.join(tmp, "in.fa")
        with open(seq_path, "w") as f:
            for name, row in ref.items():
                f.write(f">{name}\n{row.replace('-', '').replace('.', '')}\n")
        proc = subprocess.run(
            [sys.executable, "-m", "historian_tpu", "recon"]
            + platform + mode + ["-output", "fasta", seq_path],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        if proc.returncode != 0:
            return {"error": proc.stderr.strip().splitlines()[-1][:200]}
        out_path = os.path.join(tmp, "out.fa")
        with open(out_path, "w") as f:
            f.write(proc.stdout)
        sps, tcs = score(read_alignment(out_path), ref)
    return {"sps": round(sps, 4), "tcs": round(tcs, 4)}


def sim_ratios(n: int, platform: list[str]):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_simulation.py"),
         "-n", str(n), "-modes", "ma,hist"] + platform,
        capture_output=True, text=True, cwd=REPO, timeout=14400,
    )
    if proc.returncode != 0:
        return {"error": (proc.stderr or proc.stdout).strip().splitlines()[-1][:200]}
    out = {}
    # bench_simulation summary lines: "  ma: ins 1.04 del 0.81 (reference ...)"
    for line in proc.stdout.splitlines():
        m = re.match(r"\s*(\w[\w.]*):\s*ins\s+([\d.]+)\s+del\s+([\d.]+)", line)
        if m:
            out[m.group(1)] = {
                "ins_ratio": float(m.group(2)),
                "del_ratio": float(m.group(3)),
            }
    if not out:
        out = {"raw": proc.stdout.strip().splitlines()[-8:]}
    out["n"] = n
    return out


def main() -> None:
    args = sys.argv[1:]
    rnd = int(args[args.index("-round") + 1]) if "-round" in args else 0
    n = int(args[args.index("-n") + 1]) if "-n" in args else 12
    platform = []
    if "-platform" in args:
        i = args.index("-platform")
        platform = args[i : i + 2]
    record: dict = {"round": rnd, "alignment": {}, "simulation": {}}
    for name, (path, mode) in CORPUS.items():
        record["alignment"][name] = score_case(path, mode, platform)
        print(name, record["alignment"][name], file=sys.stderr)
    if n > 0:
        record["simulation"] = sim_ratios(n, platform)
        print("simulation", record["simulation"], file=sys.stderr)
    out_path = os.path.join(REPO, f"ACCURACY_r{rnd:02d}.json")
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)
    # round-over-round diff note
    prev = sorted(
        p for p in glob.glob(os.path.join(REPO, "ACCURACY_r*.json"))
        if p != out_path
    )
    if prev:
        with open(prev[-1]) as f:
            old = json.load(f)
        for name, cur in record["alignment"].items():
            was = old.get("alignment", {}).get(name)
            if was and "sps" in was and "sps" in cur:
                d = cur["sps"] - was["sps"]
                flag = "  <-- REGRESSION?" if d < -0.02 else ""
                print(f"diff {name}: SPS {was['sps']} -> {cur['sps']} "
                      f"({d:+.4f}){flag}", file=sys.stderr)


if __name__ == "__main__":
    main()
