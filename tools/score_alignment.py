#!/usr/bin/env python
"""Alignment accuracy scoring: SPS and TCS (the qscore metrics).

Counterpart of the reference's benchmark apparatus (doc/bench/Makefile
drives drive5 qscore over BAliBase/PREFAB).  Scores a test alignment
against a reference alignment of the same sequences:

- SPS (sum-of-pairs / Q score): fraction of residue pairs aligned in the
  reference that are also aligned in the test.
- TCS (total column / TC score): fraction of reference columns that are
  reproduced exactly.

Usage: python tools/score_alignment.py <test.fa> <ref.fa> [--ids-from-ref]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from historian_tpu.core.seqs import read_fasta
from historian_tpu.core.stockholm import Stockholm


def read_alignment(path: str) -> dict[str, str]:
    with open(path) as f:
        head = f.read(16)
    if head.startswith("# STOCKHOLM"):
        stock = Stockholm.read(path)
        return {s.name: s.seq for s in stock.gapped}
    return {s.name: s.seq for s in read_fasta(path)}


def residue_columns(seq: str) -> np.ndarray:
    """Map residue index -> column index."""
    cols = [c for c, ch in enumerate(seq) if ch not in "-."]
    return np.array(cols, dtype=np.int64)


def score(test: dict[str, str], ref: dict[str, str]) -> tuple[float, float]:
    names = [n for n in ref if n in test]
    if len(names) < 2:
        raise ValueError("need at least two shared sequences")
    lens = {len(ref[n]) for n in names}
    if len(lens) != 1:
        raise ValueError("reference rows have unequal lengths -- not an alignment")
    test_cols = {n: residue_columns(test[n]) for n in names}
    ref_cols = {n: residue_columns(ref[n]) for n in names}
    for n in names:
        if len(test_cols[n]) != len(ref_cols[n]):
            raise ValueError(f"sequence {n} has different residue counts in test and reference")

    # pair score: residue pairs (i-th of A, j-th of B) aligned in both
    total_pairs = 0
    matched_pairs = 0
    # column-correctness bookkeeping for TCS
    ref_len = len(next(iter(ref.values())))
    col_ok = np.ones(ref_len, dtype=bool)
    col_used = np.zeros(ref_len, dtype=bool)

    for ai in range(len(names) - 1):
        for bi in range(ai + 1, len(names)):
            a, b = names[ai], names[bi]
            # reference pairing: residues of a and b sharing a ref column
            ra, rb = ref_cols[a], ref_cols[b]
            ta, tb = test_cols[a], test_cols[b]
            # invert: ref column -> residue index (or -1)
            inv_b = np.full(ref_len, -1, dtype=np.int64)
            inv_b[rb] = np.arange(len(rb))
            paired = inv_b[ra]  # for each residue of a: paired residue of b or -1
            sel = paired >= 0
            total_pairs += int(sel.sum())
            # test pairing for the same residue pairs
            inv_tb = {}
            tb_cols = tb
            ta_cols = ta
            same = np.zeros(len(ra), dtype=bool)
            same[sel] = ta_cols[sel] >= 0
            # aligned in test iff test columns equal
            same[sel] = ta_cols[np.nonzero(sel)[0]] == tb_cols[paired[sel]]
            matched_pairs += int(same[sel].sum())
            col_used[ra[sel]] = True
            bad = ra[sel][~same[sel]]
            col_ok[bad] = False

    sps = matched_pairs / total_pairs if total_pairs else 1.0
    used = col_used & col_ok
    tcs = used.sum() / col_used.sum() if col_used.sum() else 1.0
    return float(sps), float(tcs)


def main() -> None:
    test = read_alignment(sys.argv[1])
    ref = read_alignment(sys.argv[2])
    sps, tcs = score(test, ref)
    print(f"SPS {sps:.4f}")
    print(f"TCS {tcs:.4f}")


if __name__ == "__main__":
    main()
