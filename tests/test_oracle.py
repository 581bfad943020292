"""Validate the DP oracle against exact brute-force ensemble enumeration.

This is the ground-truth anchor of the whole test pyramid: the NumPy oracle's
recurrences are checked against literal enumeration of every secondary
structure; the TPU implementation is then checked against the oracle.
"""

import numpy as np
import pytest

from rna_algos_tpu.params import contrafold
from rna_algos_tpu.utils import bytes2seq
from tests.oracle import fold_oracle, brute_force

SEQS = [
    "GGGAAAACCC",
    "GCGCUUCGGCGC",
    "AUGGCAUCCUAG",
    "GGAUACUUCGGUAUCC",
]

FSS = contrafold.build_fold_score_sets()


@pytest.mark.parametrize("seq_str", SEQS)
def test_turner_oracle_matches_brute_force(seq_str):
    seq = bytes2seq(seq_str)
    bpp, _, sums = fold_oracle.mccaskill_oracle(seq, uses_contra_model=False)
    exact_bpp, exact_logz = brute_force.brute_force_bpp(seq, model="turner")
    assert np.isclose(float(sums["ext"][0][len(seq) - 1]), exact_logz, atol=2e-3)
    keys = set(bpp) | set(exact_bpp)
    for k in keys:
        assert abs(bpp.get(k, 0.0) - exact_bpp.get(k, 0.0)) < 1e-3, (k, bpp.get(k), exact_bpp.get(k))


@pytest.mark.parametrize("seq_str", SEQS)
@pytest.mark.parametrize("short_hairpins", [False, True])
def test_contra_oracle_matches_brute_force(seq_str, short_hairpins):
    seq = bytes2seq(seq_str)
    bpp, _, sums = fold_oracle.mccaskill_oracle(
        seq, uses_contra_model=True, allows_short_hairpins=short_hairpins, fss=FSS
    )
    exact_bpp, exact_logz = brute_force.brute_force_bpp(
        seq, model="contra", fss=FSS, allows_short_hairpins=short_hairpins
    )
    assert np.isclose(float(sums["ext"][0][len(seq) - 1]), exact_logz, atol=2e-3)
    keys = set(bpp) | set(exact_bpp)
    for k in keys:
        assert abs(bpp.get(k, 0.0) - exact_bpp.get(k, 0.0)) < 1e-3, (k, bpp.get(k), exact_bpp.get(k))


def test_oracle_probability_bounds():
    seq = bytes2seq("GGCGCAACGUUCGCGCC")
    for contra in (False, True):
        bpp, _, _ = fold_oracle.mccaskill_oracle(
            seq, uses_contra_model=contra, fss=FSS
        )
        for v in bpp.values():
            assert -1e-3 <= float(v) < 1 + 1e-3
