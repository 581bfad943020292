"""Parameter-table structure and assembly tests."""

import numpy as np

from rna_algos_tpu.constants import (
    A, C, G, U, PSEUDO_BASE, CANONICAL_PAIRS,
    MAX_LOOP_LEN, MAX_INTERIOR_SYMMETRIC, MAX_INTERIOR_ASYMMETRIC,
    MAX_INTERIOR_EXPLICIT, RT,
)
from rna_algos_tpu.params import turner, contrafold, contralign


def test_stack_symmetry():
    """dG(a,b,c,d) == dG(d,c,b,a) (strand reversal)."""
    t = turner.STACK_SCORES
    for a, b in CANONICAL_PAIRS:
        for c, d in CANONICAL_PAIRS:
            assert t[a][b][c][d] == t[d][c][b][a]


def test_stack_known_values():
    t = turner.STACK_SCORES
    # GC/CG is the strongest Watson-Crick stack: -3.42 kcal/mol.
    assert np.isclose(t[G][C][C][G], 3.42 / RT, rtol=1e-5)
    assert np.isclose(t[A][U][A][U], 0.93 / RT, rtol=1e-5)
    # Tandem GU/UG is destabilizing (+1.29): negative score.
    assert t[G][U][U][G] < 0


def test_pad_slot_neutral():
    assert np.all(turner.STACK_SCORES[PSEUDO_BASE] == 0)
    assert np.all(turner.DANGLING_SCORES_3PRIME[:, :, PSEUDO_BASE] == 0)


def test_hairpin_init_lengths():
    t = turner.HAIRPIN_SCORES_INIT
    assert len(t) == 31
    assert t[0] == -np.inf and t[2] == -np.inf
    assert np.isfinite(t[3]) and np.isfinite(t[30])


def test_special_hairpins_encoding():
    seqs, lens, scores = (
        turner.HAIRPIN_SPECIAL_SEQS,
        turner.HAIRPIN_SPECIAL_LENS,
        turner.HAIRPIN_SPECIAL_SCORES,
    )
    assert seqs.shape[0] == lens.shape[0] == scores.shape[0]
    # first entry: CAACG triloop including its closing C-G pair
    assert list(seqs[0][:5]) == [C, A, A, C, G] and lens[0] == 5


def test_contra_fold_score_sets_assembly():
    s = contrafold.build_fold_score_sets()
    # Cumulative arrays are prefix sums of the "at least" arrays
    # (mccaskill_algo.rs:60-86).
    np.testing.assert_allclose(
        s["hairpin_scores_len_cumulative"],
        np.cumsum(s["hairpin_scores_len_atleast"]),
        rtol=1e-6,
    )
    assert len(s["hairpin_scores_len_cumulative"]) == MAX_LOOP_LEN + 1
    assert len(s["bulge_scores_len_cumulative"]) == MAX_LOOP_LEN
    assert len(s["interior_scores_len_cumulative"]) == MAX_LOOP_LEN - 1
    assert len(s["interior_scores_symmetric_cumulative"]) == MAX_INTERIOR_SYMMETRIC
    assert len(s["interior_scores_asymmetric_cumulative"]) == MAX_INTERIOR_ASYMMETRIC
    assert s["interior_scores_explicit"].shape == (
        MAX_INTERIOR_EXPLICIT,
        MAX_INTERIOR_EXPLICIT,
    )


def test_contra_canonical_masking():
    """Non-canonical entries stay at the init value 0 (mccaskill_algo.rs:124-203)."""
    s = contrafold.build_fold_score_sets()
    assert s["helix_close_scores"][A][A] == 0.0
    assert np.all(s["stack_scores"][A][A] == 0.0)
    assert np.all(s["stack_scores"][A][U][A][A] == 0.0)
    # canonical entries carried over
    assert s["stack_scores"][G][C][C][G] != 0.0


def test_contrafold_parser_round_trip():
    text = """
base_pair_AU 1.5
helix_stacking_AUAU -0.7
terminal_mismatch_CGAA 0.25
hairpin_length_at_least_3 -0.5
bulge_length_at_least_1 -1.25
internal_length_at_least_2 -0.75
internal_symmetric_length_at_least_1 -0.1
internal_asymmetry_at_least_1 -0.2
internal_explicit_1_2 0.3
bulge_0x1_nucleotides_A 0.05
internal_1x1_nucleotides_GU 0.06
helix_closing_AU -0.4
dangle_left_AUG 0.1
dangle_right_AUC 0.2
multi_base -3.0
multi_paired -0.3
multi_unpaired -0.1
external_paired 0.2
external_unpaired -0.05
"""
    t = contrafold.parse_contrafold_params(text)
    assert t["basepair_scores"][A][U] == np.float32(1.5)
    assert t["basepair_scores"][U][A] == np.float32(1.5)  # symmetrized
    assert t["stack_scores"][A][U][A][U] == np.float32(-0.7)
    assert t["stack_scores"][U][A][U][A] == np.float32(-0.7)  # reversal
    assert t["terminal_mismatch_scores"][C][G][A][A] == np.float32(0.25)
    assert t["hairpin_scores_len_atleast"][3] == np.float32(-0.5)
    assert t["bulge_scores_len_atleast"][0] == np.float32(-1.25)
    assert t["interior_scores_len_atleast"][0] == np.float32(-0.75)
    assert t["interior_scores_explicit"][0][1] == np.float32(0.3)
    assert t["interior_scores_explicit"][1][0] == np.float32(0.3)
    assert t["bulge_scores_0x1"][A] == np.float32(0.05)
    assert t["interior_scores_1x1"][G][U] == np.float32(0.06)
    assert t["helix_close_scores"][A][U] == np.float32(-0.4)
    assert t["dangling_scores_left"][A][U][G] == np.float32(0.1)
    assert t["dangling_scores_right"][A][U][C] == np.float32(0.2)
    assert t["multibranch_score_base"] == np.float32(-3.0)
    assert t["external_score_unpair"] == np.float32(-0.05)


def test_contralign_scores_match_reference_compiled_values():
    """The parser over the published params must reproduce the reference's
    compiled constants (compiled_align_scores.rs:1-19)."""
    s = contralign.DEFAULT_ALIGN_SCORES
    assert s["match_scores"][A][A] == np.float32(0.5256508867)
    assert s["match_scores"][A][C] == np.float32(-0.40906402)
    assert s["match_scores"][C][A] == np.float32(-0.40906402)
    assert s["match_scores"][U][U] == np.float32(0.459052045)
    assert s["insert_scores"][A] == np.float32(-0.002521927159)
    assert s["insert_scores"][U] == np.float32(-0.01290054598)
    assert s["init_match_score"] == np.float32(0.3959924457)
    assert s["init_insert_score"] == np.float32(-0.3488104904)
    assert s["match2match_score"] == np.float32(2.50575671)
    assert s["match2insert_score"] == np.float32(0.1970448791)  # match_to_insert2
    assert s["insert_extend_score"] == np.float32(1.014026583)  # insert2_extend
    assert s["insert_switch_score"] == np.float32(-7.346968782)  # unused in DP
