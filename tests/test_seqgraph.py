"""SeqGraph (-savedot) tests."""

import os
import subprocess
import sys

import numpy as np

from historian_tpu.engine.seqgraph import SeqGraph, _Node

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_simplify_collapses_chain():
    g = SeqGraph()
    for seq in ["", "A", "C", "G", ""]:
        g.nodes.append(_Node(seq=seq))
    g.edges = {(0, 1), (1, 2), (2, 3), (3, 4)}
    g._build_indices()
    s = g.simplify()
    # null endpoints eliminated, chain collapsed into one node "ACG"
    assert s.n_nodes == 1
    assert s.nodes[0].seq == "ACG"


def test_simplify_merges_char_classes():
    # two parallel single-char nodes with identical contexts -> [XY] class
    g = SeqGraph()
    for seq in ["S", "A", "C", "E"]:
        g.nodes.append(_Node(seq=seq))
    g.edges = {(0, 1), (0, 2), (1, 3), (2, 3)}
    g._build_indices()
    merged = g.eliminate_null().eliminate_duplicates().merge_char_classes()
    assert [n.seq for n in merged.nodes] == ["S", "[AC]", "E"]
    # full simplify then collapses the resulting chain into one node
    assert [n.seq for n in g.simplify().nodes] == ["S[AC]E"]


def test_savedot_cli(ref_data, tmp_path):
    dot_file = str(tmp_path / "out.dot")
    env = dict(os.environ)
    env["HISTORIAN_PLATFORM"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    result = subprocess.run(
        [sys.executable, "-m", "historian_tpu", "recon", "-careful", "-norefine",
         "-output", "fasta",
         "-model", os.path.join(ref_data, "testcount.jukescantor.json"),
         "-guide", os.path.join(ref_data, "testcount.fa"),
         "-tree", os.path.join(ref_data, "testcount.nh"),
         "-savedot", dot_file],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-1500:]
    with open(dot_file) as f:
        dot = f.read()
    assert dot.startswith("digraph profile {")
    assert 'label = "ACCGGTT"' in dot


def test_codon_tokenizer_roundtrip():
    from historian_tpu.core.ctok import codon_tokenizer

    dna = "atggctgccgat"
    toks = codon_tokenizer.tokenize(dna)
    assert len(toks) == 4
    assert codon_tokenizer.detokenize(toks) == dna
    # terminal stop codon silently dropped
    assert len(codon_tokenizer.tokenize(dna + "taa")) == 4
    # internal stop rejected
    import pytest

    with pytest.raises(ValueError):
        codon_tokenizer.tokenize("taa" + dna)
