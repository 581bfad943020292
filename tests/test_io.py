"""I/O surface: FASTA, alignment readers, encodings, output formats (C18)."""

import numpy as np
import pytest

from rna_algos_tpu.constants import A, C, G, U, PSEUDO_BASE
from rna_algos_tpu.utils import (
    align_char2base,
    bytes2seq,
    fold_str,
    pairs_from_fold_str,
    read_align_clustal,
    read_align_fasta,
    read_align_stockholm,
    read_fasta,
)
from rna_algos_tpu.utils.output import _fmt, probs2str, probs2str_arrays


def test_bytes2seq_strict():
    np.testing.assert_array_equal(bytes2seq("ACGUacgu"), [A, C, G, U, A, C, G, U])
    with pytest.raises(ValueError):
        bytes2seq("ACGT")  # T is invalid, like the reference panic (utils.rs:570)


def test_align_char2base_permissive():
    assert align_char2base("A") == A
    assert align_char2base("-") == PSEUDO_BASE
    assert align_char2base("N") == PSEUDO_BASE


def test_read_fasta_fixture():
    recs = read_fasta("assets/sampled_trnas.fa")
    assert len(recs) == 6
    assert sorted(len(r.seq) for r in recs) == [68, 73, 73, 74, 84, 89]


def test_alignment_readers(tmp_path):
    fasta = tmp_path / "a.fa"
    fasta.write_text(">s1\nAC-G\n>s2\nACGG\n")
    cols, ids = read_align_fasta(str(fasta))
    assert ids == ["s1", "s2"]
    assert cols[2] == [PSEUDO_BASE, G]

    sth = tmp_path / "a.sth"
    sth.write_text("# STOCKHOLM 1.0\ns1 AC-G\ns2 ACGG\n//\n")
    cols2, ids2 = read_align_stockholm(str(sth))
    assert (cols2, ids2) == (cols, ids)

    clustal = tmp_path / "a.aln"
    clustal.write_text(
        "CLUSTAL W\n\ns1 AC\ns2 AC\n\ns1 -G\ns2 GG\n"
    )
    cols3, ids3 = read_align_clustal(str(clustal))
    assert ids3 == ["s1", "s2"]
    assert cols3 == cols


def test_fold_str_roundtrip():
    pairs = [(0, 9), (2, 7)]
    s = fold_str(pairs, 10)
    assert s == "(.(....).)"
    assert sorted(pairs_from_fold_str(s)) == pairs


def test_probs2str_formats():
    out = probs2str([(0, 5, 0.5), (1, 6, 1.0)])
    assert out == "0,5,0.5 1,6,1 "
    assert probs2str_arrays(
        np.array([0, 1]), np.array([5, 6]), np.array([0.5, 1.0], np.float32)
    ) == out
    assert _fmt(np.float32(2.0) ** -7) == "0.0078125"


def test_align_from_cols_pos_maps():
    from rna_algos_tpu.utils import align_from_cols

    # seq0: A C - G ; seq1: A - G G
    cols = [[A, A], [C, PSEUDO_BASE], [PSEUDO_BASE, G], [G, G]]
    align = align_from_cols(cols)
    assert align.pos_map_sets[0] == [1, 2, 2, 3]
    assert align.pos_map_sets[1] == [1, 1, 2, 3]
    assert align.cols == cols
