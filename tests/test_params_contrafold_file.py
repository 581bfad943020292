"""CONTRAfold v2.02 parameter-FILE ingestion: end-to-end drop-in path.

Complements test_params.py's parser round-trip with the full file workflow:
a fixture file in the `contrafold.params.complementary` layout (feature name
+ weight per line, including features this model family does not consume) is
written to disk, ingested via RNA_ALGOS_CONTRA_PARAMS, assembled through
build_fold_score_sets, and consumed by the real DP — proving that dropping
in the real learned file requires no code changes (PARAMS.md).
"""

import numpy as np
import pytest

from rna_algos_tpu.constants import A, C, G, U
from rna_algos_tpu.params import build_fold_score_sets, parse_contrafold_params


FIXTURE = """\
base_pair_AU 0.314
base_pair_CG 1.102
base_pair_GU 0.205
helix_stacking_AUAU 0.422
helix_stacking_CGCG 0.871
terminal_mismatch_CGAA 0.095
hairpin_length_at_least_0 -1.25
hairpin_length_at_least_3 -0.12
bulge_length_at_least_1 -0.93
internal_length_at_least_2 -0.61
internal_symmetric_length_at_least_1 -0.37
internal_asymmetry_at_least_1 -0.52
internal_explicit_1_2 0.044
bulge_0x1_nucleotides_G -0.11
internal_1x1_nucleotides_AG 0.061
helix_closing_CG -0.21
dangle_left_CGA 0.033
dangle_right_CGU -0.015
multi_base -0.34
multi_unpaired -0.028
multi_paired -0.012
external_unpaired -0.0091
external_paired 0.051
single_base_pair_stacking_left_AUA 0.017
log_score_something_unconsumed 0.5
"""


@pytest.fixture()
def from_file(tmp_path, monkeypatch):
    p = tmp_path / "contrafold.params.complementary"
    p.write_text(FIXTURE)
    monkeypatch.setenv("RNA_ALGOS_CONTRA_PARAMS", str(p))
    return build_fold_score_sets()


def test_env_file_feeds_fold_score_sets(from_file):
    fss = from_file
    assert fss["basepair_scores"][C][G] == np.float32(1.102)
    assert fss["basepair_scores"][G][C] == np.float32(1.102)  # symmetrized
    assert fss["basepair_scores"][A][U] == np.float32(0.314)
    assert fss["stack_scores"][C][G][C][G] == np.float32(0.871)
    assert fss["terminal_mismatch_scores"][C][G][A][A] == np.float32(0.095)
    assert fss["helix_close_scores"][C][G] == np.float32(-0.21)
    assert fss["dangling_scores_left"][C][G][A] == np.float32(0.033)
    assert fss["bulge_scores_0x1"][G] == np.float32(-0.11)
    assert fss["interior_scores_1x1"][A][G] == np.float32(0.061)
    assert fss["multibranch_score_base"] == np.float32(-0.34)
    assert fss["external_score_unpair"] == np.float32(-0.0091)
    # explicit table symmetrized
    assert fss["interior_scores_explicit"][0][1] == np.float32(0.044)
    assert fss["interior_scores_explicit"][1][0] == np.float32(0.044)


def test_cumulative_prefix_sums(from_file):
    fss = from_file
    # hairpin_length_at_least increments accumulate (mccaskill_algo.rs:60-86)
    cum = fss["hairpin_scores_len_cumulative"]
    assert cum[0] == np.float32(-1.25)
    np.testing.assert_allclose(cum[3], -1.25 + -0.12, atol=1e-7)
    assert cum[2] == cum[1] == cum[0]


def test_unconsumed_features_ignored():
    t = parse_contrafold_params(FIXTURE)
    # parsing must not crash on foreign features and must not corrupt tables
    assert t["basepair_scores"][C][G] == np.float32(1.102)


def test_file_weights_flow_into_dp(from_file, trna_records):
    """The DP consumes the loaded weights (results differ from defaults)."""
    import jax.numpy as jnp

    from rna_algos_tpu.models import mccaskill as M
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.constants import PSEUDO_BASE

    seq = trna_records[0].seq
    N = 96
    arr = np.full((1, N), PSEUDO_BASE, dtype=np.int32)
    arr[0, : len(seq)] = seq
    ns = np.array([len(seq)], dtype=np.int32)

    bpp_file, _ = M.mccaskill_bpp_batch(
        jnp.asarray(arr), jnp.asarray(ns),
        S.contra_table_pytree(from_file), N=N, contra=True,
    )
    from rna_algos_tpu.params.contrafold import default_contra_tables

    bpp_default, _ = M.mccaskill_bpp_batch(
        jnp.asarray(arr), jnp.asarray(ns),
        S.contra_table_pytree(build_fold_score_sets(raw=default_contra_tables())),
        N=N, contra=True,
    )
    n = len(seq)
    a = np.asarray(bpp_file)[0, :n, :n]
    b = np.asarray(bpp_default)[0, :n, :n]
    assert np.abs(a - b).max() > 1e-3  # different weights, different ensemble
    assert np.all(a > -1e-3) and np.all(a < 1 + 1e-3)  # bounds property holds
