#!/usr/bin/env python
"""Generate preset substitution-model JSON files from published PAML data.

Reads PAML-format exchangeability matrices (.dat files: lower-triangular
exchangeabilities S_ij followed by equilibrium frequencies pi) and writes
rate-model JSON presets: Q_ij = S_ij * pi_j, normalized so the expected
substitution rate at equilibrium is 1, with the framework's default indel
parameters.  Also emits the simple Jukes-Cantor nucleotide presets.

The PAML .dat files are published scientific data (Dayhoff 1978; Jones,
Taylor & Thornton 1992; Whelan & Goldman 2001; Le & Gascuel 2008;
Kosiol, Holmes & Goldman 2007 for the ECM codon models).

Usage: python tools/convert_paml.py <paml_dir_amino> <paml_dir_codon> <out_dir>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from historian_tpu.core.ctok import CodonTokenizer

AMINO_ALPHABET = "arndcqeghilkmfpstwyv"  # PAML order: ARNDCQEGHILKMFPSTWYV
DEFAULT_INDEL = {"insrate": 0.01, "delrate": 0.01, "insextprob": 0.66, "delextprob": 0.66}


def read_paml(path: str, n: int):
    """Parse a PAML .dat: n-1 lower-triangular rows then n frequencies."""
    with open(path) as f:
        fields: list[float] = []
        done = False
        for line in f:
            for x in line.split():
                try:
                    fields.append(float(x))
                except ValueError:
                    done = True  # commentary follows the data block
                    break
            if done:
                break
    need = n * (n - 1) // 2 + n
    if len(fields) < need:
        raise ValueError(f"{path}: expected at least {need} numbers, got {len(fields)}")
    exch = np.zeros((n, n))
    k = 0
    for i in range(1, n):
        for j in range(i):
            exch[i, j] = exch[j, i] = fields[k]
            k += 1
    eqm = np.array(fields[k : k + n])
    return exch, eqm


def make_model_json(alphabet: str, exch: np.ndarray, eqm: np.ndarray, wildcard: str, indel=DEFAULT_INDEL) -> dict:
    n = len(alphabet)
    q = exch * eqm[None, :]
    np.fill_diagonal(q, 0.0)
    expected_rate = float((eqm[:, None] * q).sum())
    q /= expected_rate
    model = dict(indel)
    model["alphabet"] = alphabet
    model["wildcard"] = wildcard
    model["rootprob"] = {alphabet[i]: eqm[i] for i in range(n)}
    model["subrate"] = {
        alphabet[i]: {alphabet[j]: q[i, j] for j in range(n) if j != i and q[i, j] > 0}
        for i in range(n)
    }
    return model


def jc_json(alphabet: str) -> dict:
    model = dict(DEFAULT_INDEL)
    model["alphabet"] = alphabet
    model["wildcard"] = "n"
    model["subrate"] = {
        a: {b: 0.3333 for b in alphabet if b != a} for a in alphabet
    }
    return model


def main(amino_dir: str, codon_dir: str, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)

    def dump(name: str, obj: dict) -> None:
        with open(os.path.join(out_dir, name + ".json"), "w") as f:
            json.dump(obj, f, indent=1)
        print("wrote", name)

    for name in ["lg", "wag", "jones", "dayhoff"]:
        exch, eqm = read_paml(os.path.join(amino_dir, name + ".dat"), 20)
        dump(name, make_model_json(AMINO_ALPHABET, exch, eqm, "x"))

    codon_alphabet = CodonTokenizer().token_alphabet(allow_stop_codons=False)
    for name in ["ECMrest", "ECMunrest"]:
        exch, eqm = read_paml(os.path.join(codon_dir, name + ".dat"), 61)
        dump(name, make_model_json(codon_alphabet, exch, eqm, "x"))

    dump("jc", jc_json("acgt"))
    dump("jcrna", jc_json("acgu"))


if __name__ == "__main__":
    main(*sys.argv[1:4])
