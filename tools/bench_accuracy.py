#!/usr/bin/env python
"""Alignment-accuracy benchmark harness (the doc/bench analogue).

Mirrors the reference's BAliBase/PREFAB pipeline (doc/bench/Makefile:
strip gaps from each reference alignment, realign with historian, score
with drive5 qscore): for every reference alignment given, degap the
sequences, reconstruct an alignment with the CLI, and report per-case
and mean SPS/TCS (tools/score_alignment.py implements the qscore
metrics).

Usage:
  python tools/bench_accuracy.py [-fast|-careful] [-platform cpu] ref1 [ref2...]
Reference alignments may be FASTA (gapped) or Stockholm.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from tools.score_alignment import read_alignment, score


def main() -> None:
    args = sys.argv[1:]
    mode = [a for a in args if a in ("-fast", "-careful")]
    platform = []
    if "-platform" in args:
        i = args.index("-platform")
        platform = args[i : i + 2]
        del args[i : i + 2]
    paths = [a for a in args if a not in ("-fast", "-careful")]
    if not paths:
        sys.exit(__doc__)

    results = []
    for ref_path in paths:
        ref = read_alignment(ref_path)
        # drop reconstructed-ancestor rows (historian names them with their
        # subtree's Newick string): only leaves are realigned and scored,
        # and Newick metacharacters in row names break tree round-trips
        ref = {name: row for name, row in ref.items() if not name.startswith("(")}
        if len({len(v) for v in ref.values()}) != 1:
            print(f"{ref_path}\tFAILED\nreference rows have unequal lengths -- not an alignment")
            continue
        with tempfile.TemporaryDirectory() as tmp:
            seq_path = os.path.join(tmp, "in.fa")
            with open(seq_path, "w") as f:
                for name, row in ref.items():
                    f.write(f">{name}\n{row.replace('-', '').replace('.', '')}\n")
            cmd = (
                [sys.executable, "-m", "historian_tpu", "recon"]
                + platform + mode + ["-output", "fasta", seq_path]
            )
            proc = subprocess.run(
                cmd, capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            if proc.returncode != 0:
                print(f"{ref_path}\tFAILED\n{proc.stderr.strip().splitlines()[-1]}")
                continue
            test_path = os.path.join(tmp, "out.fa")
            with open(test_path, "w") as f:
                f.write(proc.stdout)
            try:
                sps, tcs = score(read_alignment(test_path), ref)
            except ValueError as e:
                print(f"{ref_path}\tFAILED\n{e}")
                continue
        results.append((ref_path, sps, tcs))
        print(f"{ref_path}\tSPS {sps:.4f}\tTCS {tcs:.4f}")

    if results:
        mean_sps = sum(r[1] for r in results) / len(results)
        mean_tcs = sum(r[2] for r in results) / len(results)
        print(f"MEAN ({len(results)} cases)\tSPS {mean_sps:.4f}\tTCS {mean_tcs:.4f}")


if __name__ == "__main__":
    main()
