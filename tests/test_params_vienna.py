"""ViennaRNA .par ingestion: layout mapping, install path, and the embedded
published-value spot checks (VERDICT round 1, item 1).

The fixture .par is synthesized with position-coded values so every index
permutation the parser performs (reversed inner pairs in `stack`, the
[x][z][y] order of int21, the [x1][x2][y2][y1] order of int22) is pinned
independently of any real parameter file being available here.
"""

import math

import numpy as np
import pytest

from rna_algos_tpu.constants import A, C, G, U, RT
from rna_algos_tpu.params import turner as T
from rna_algos_tpu.params import vienna

PAIRS = vienna.PAIR_ORDER
BASES = "NACGU"
PAIR_STR = ["CG", "GC", "GU", "UG", "AU", "UA"]


def dg(deka):
    return np.float32(-(deka / 100.0) / RT)


def _fixture_par():
    """Synthetic .par covering every section, with value = positional code."""
    lines = ["## RNAfold parameter file v2.0", ""]

    def block(name, vals, per_line=10):
        lines.append(f"# {name}")
        for k in range(0, len(vals), per_line):
            lines.append(
                "  ".join(
                    "INF" if math.isinf(v) else str(int(v))
                    for v in vals[k : k + per_line]
                )
            )
        lines.append("")

    # stack: 7x7 incl. the NN row/col (value = 100*p1 + p2)
    block("stack", [100 * p1 + p2 for p1 in range(7) for p2 in range(7)])
    # mismatch tables: 7 pairs x 5 x 5 (value = 10000*p + 100*x + y)
    for name in (
        "mismatch_hairpin",
        "mismatch_interior",
        "mismatch_interior_1n",
        "mismatch_interior_23",
        "mismatch_multi",
        "mismatch_exterior",
    ):
        off = {"mismatch_hairpin": 1, "mismatch_interior": 2,
               "mismatch_interior_1n": 3, "mismatch_interior_23": 4,
               "mismatch_multi": 5, "mismatch_exterior": 6}[name]
        block(name, [
            100000 * off + 10000 * p + 100 * x + y
            for p in range(7) for x in range(5) for y in range(5)
        ])
    for name, off in (("dangle5", 7), ("dangle3", 8)):
        block(name, [1000 * off + 10 * p + x for p in range(7) for x in range(5)])
    block("int11", [
        -(10000 * p1 + 1000 * p2 + 100 * x + y)
        for p1 in range(7) for p2 in range(7)
        for x in range(5) for y in range(5)
    ])
    block("int21", [
        -(100000 * p1 + 10000 * p2 + 1000 * x + 100 * z + y)
        for p1 in range(7) for p2 in range(7)
        for x in range(5) for z in range(5) for y in range(5)
    ])
    # int22: canonical pairs and real bases only (6x6x4^4)
    block("int22", [
        -(100000 * p1 + 10000 * p2 + 1000 * x1 + 100 * x2 + 10 * y2 + y1)
        for p1 in range(6) for p2 in range(6)
        for x1 in range(4) for x2 in range(4)
        for y2 in range(4) for y1 in range(4)
    ])
    block("hairpin", [math.inf] * 3 + list(range(530, 530 + 28)))
    block("bulge", [math.inf] + list(range(380, 380 + 30)))
    block("interior", [math.inf] * 4 + list(range(110, 110 + 27)))
    block("NINIO", [60, 60, 300])
    block("ML_params", [0, 0, 930, 3000, -90, -220])
    lines.append("# Misc")
    lines.append("   330   320    50    50   107.856")
    lines.append("")
    lines.append("# Triloops")
    lines.append("  CAACG   680   300")
    lines.append("# Tetraloops")
    lines.append("  CCAAGG  330  -1030")
    lines.append("# Hexaloops")
    lines.append("  ACAGUACU  280  -1680")
    lines.append("# END")
    return "\n".join(lines)


@pytest.fixture(scope="module")
def parsed():
    return vienna.parse_vienna_par(_fixture_par())


def test_stack_reversed_inner_mapping(parsed):
    t = parsed["STACK_SCORES"]
    # motif 5'-a c-3' / 3'-b d-5': file row = T(a,b), col = T(d,c)
    for p1, (a, b) in enumerate(PAIRS):
        for p2, (d, c) in enumerate(PAIRS):
            assert t[a][b][c][d] == dg(100 * p1 + p2), (PAIR_STR[p1], PAIR_STR[p2])


def test_mismatch_tables_direct_mapping(parsed):
    for key, off in (
        ("TERMINAL_MISMATCH_SCORES_HAIRPIN", 1),
        ("TERMINAL_MISMATCH_SCORES_INTERIOR", 2),
        ("TERMINAL_MISMATCH_SCORES_1XMANY", 3),
        ("TERMINAL_MISMATCH_SCORES_2X3", 4),
        ("TERMINAL_MISMATCH_SCORES_MULTIBRANCH", 5),
    ):
        t = parsed[key]
        for p, (a, b) in enumerate(PAIRS):
            for x in range(4):
                for y in range(4):
                    want = 100000 * off + 10000 * p + 100 * (x + 1) + (y + 1)
                    got = t[a][b][x][y]
                    if key != "TERMINAL_MISMATCH_SCORES_MULTIBRANCH" and (
                        (a, b) in ((A, U), (U, A), (G, U), (U, G))
                    ):
                        # Vienna bakes the terminal-AU/GU closure (Misc
                        # field 2 = 50 in the fixture) into hairpin and
                        # interior mismatch rows; the loader unbakes it
                        # because the scoring re-adds
                        # HELIX_AUGU_END_PENALTY separately
                        got = got + np.float32(dg(50))
                    assert got == pytest.approx(dg(want), abs=2e-6), (
                        key, p, x, y
                    )


def test_dangles(parsed):
    for key, off in (
        ("DANGLING_SCORES_5PRIME", 7),
        ("DANGLING_SCORES_3PRIME", 8),
    ):
        t = parsed[key]
        for p, (a, b) in enumerate(PAIRS):
            for x in range(4):
                assert t[a][b][x] == dg(1000 * off + 10 * p + (x + 1)), (key, p, x)


def test_int11_int21_int22_permutations(parsed):
    i11 = parsed["INTERIOR_SCORES_1X1"]
    i12 = parsed["INTERIOR_SCORES_1X2"]
    i22 = parsed["INTERIOR_SCORES_2X2"]
    for p1, (a, b) in enumerate(PAIRS):
        for p2, (d, c) in enumerate(PAIRS):
            assert i11[a][b][A][U][c][d] == dg(
                -(10000 * p1 + 1000 * p2 + 100 * (A + 1) + (U + 1))
            )
            # ours [x][y][z] = vienna [x][z][y]; x=s[i+1], y=s[j-1], z=s[j-2]
            x, y, z = A, C, G
            assert i12[a][b][x][y][z][c][d] == dg(
                -(100000 * p1 + 10000 * p2
                  + 1000 * (x + 1) + 100 * (z + 1) + (y + 1))
            )
            # ours [x1][y1][x2][y2] = vienna [x1][x2][y2][y1]
            x1, y1, x2, y2 = A, C, G, U
            assert i22[a][b][x1][y1][x2][y2][c][d] == dg(
                -(100000 * p1 + 10000 * p2
                  + 1000 * x1 + 100 * x2 + 10 * y2 + y1)
            )


def test_length_tables_and_scalars(parsed):
    assert np.isneginf(parsed["HAIRPIN_SCORES_INIT"][0])
    assert parsed["HAIRPIN_SCORES_INIT"][3] == dg(530)
    assert parsed["BULGE_SCORES_INIT"][1] == dg(380)
    assert parsed["INTERIOR_SCORES_INIT"][4] == dg(110)
    assert parsed["NINIO_COEFF"] == dg(60)
    assert parsed["NINIO_MAX"] == dg(300)
    assert parsed["INIT_MULTIBRANCH_BASE"] == dg(930)
    assert parsed["COEFF_NUM_BRANCHES"] == dg(-90)
    assert parsed["HELIX_AUGU_END_PENALTY"] == dg(50)
    np.testing.assert_allclose(
        parsed["COEFF_HAIRPIN_LEN_EXTRAPOLATION"], -1.75, atol=1e-3
    )


def test_special_hairpins(parsed):
    seqs = parsed["HAIRPIN_SPECIAL_SEQS"]
    lens = parsed["HAIRPIN_SPECIAL_LENS"]
    scores = parsed["HAIRPIN_SPECIAL_SCORES"]
    assert list(lens) == [5, 6, 8]
    assert list(seqs[0][:5]) == [C, A, A, C, G]
    assert scores[0] == dg(680)
    assert scores[1] == dg(330)
    assert scores[2] == dg(280)


def test_set_tables_install_and_reset(parsed, tmp_path):
    from rna_algos_tpu.ops import scores as S

    try:
        T.set_tables({"STACK_SCORES": parsed["STACK_SCORES"]})
        tt = S.turner_table_pytree()
        assert np.asarray(tt["stack"])[C][G][G][C] == dg(100 * 0 + 0)
        # untouched tables keep their embedded defaults
        np.testing.assert_array_equal(
            np.asarray(tt["hairpin_init"]), T.HAIRPIN_SCORES_INIT
        )
    finally:
        T.set_tables(None)
    tt = S.turner_table_pytree()
    np.testing.assert_array_equal(np.asarray(tt["stack"]), T.STACK_SCORES)


def test_load_from_file_and_env(tmp_path, monkeypatch):
    par = tmp_path / "fixture.par"
    par.write_text(_fixture_par())
    loaded = vienna.load_turner_params(str(par))
    assert loaded["NINIO_MAX"] == dg(300)
    monkeypatch.setenv("RNA_ALGOS_TURNER_PARAMS", str(par))
    try:
        T.set_tables(None)  # drop cache so the env var is consulted
        tabs = T.active_tables()
        assert tabs["INIT_MULTIBRANCH_BASE"] == dg(930)
        # registry names only: nothing foreign leaks in
        assert set(tabs) == set(T.TABLE_NAMES)
    finally:
        monkeypatch.delenv("RNA_ALGOS_TURNER_PARAMS")
        T.set_tables(None)


def test_set_tables_rejects_unknown_names():
    with pytest.raises(KeyError):
        T.set_tables({"NOT_A_TABLE": np.zeros(3)})


# ---------------------------------------------------------------------------
# Embedded published-value spot checks (Turner 2004 NNDB free energies).
# These pin the EXACT_PUBLISHED tables against regressions; the dG anchors
# are the published 37C values (kcal/mol).
# ---------------------------------------------------------------------------

def kdg(kcal):
    return np.float32(-kcal / RT)


def test_embedded_wc_stack_values():
    t = T.STACK_SCORES
    # 5'-GC-3'/3'-CG-5' (most stable WC stack)
    assert t[G][C][C][G] == kdg(-3.42)
    # 5'-GG-3'/3'-CC-5'
    assert t[G][C][G][C] == pytest.approx(kdg(-3.26), abs=1e-6)
    assert t[C][G][C][G] == kdg(-3.26)
    # 5'-AA-3'/3'-UU-5'
    assert t[A][U][A][U] == kdg(-0.93)
    # strand-reversal closure
    np.testing.assert_array_equal(t[A][U][G][C], t[C][G][U][A])


def test_embedded_gu_stack_values():
    t = T.STACK_SCORES
    # 5'-GU-3'/3'-UG-5' tandem: the famously destabilizing +1.29
    assert t[G][U][U][G] == kdg(1.29)
    # 5'-UG-3'/3'-GU-5'
    assert t[U][G][G][U] == kdg(0.30)
    # 5'-CG-3'/3'-GU-5'
    assert t[C][G][G][U] == kdg(-1.41)


def test_embedded_loop_inits():
    assert T.HAIRPIN_SCORES_INIT[3] == kdg(5.40)
    assert T.HAIRPIN_SCORES_INIT[9] == kdg(6.40)
    assert T.BULGE_SCORES_INIT[1] == kdg(3.80)
    assert T.BULGE_SCORES_INIT[2] == kdg(2.80)
    assert T.INTERIOR_SCORES_INIT[4] == kdg(1.10)
    assert np.isneginf(T.INTERIOR_SCORES_INIT[3])


def test_embedded_scalars():
    assert T.NINIO_COEFF == kdg(0.60)
    assert T.NINIO_MAX == kdg(3.00)
    assert T.HELIX_AUGU_END_PENALTY == kdg(0.50)
    assert T.INIT_MULTIBRANCH_BASE == kdg(9.30)
    assert T.COEFF_NUM_BRANCHES == kdg(-0.90)
    assert T.COEFF_HAIRPIN_LEN_EXTRAPOLATION == np.float32(-1.75)


def test_embedded_special_hairpins():
    # published Turner 2004 tri/tetra/hexaloop entries
    specials = {
        tuple(s[:l]): v
        for s, l, v in zip(
            T.HAIRPIN_SPECIAL_SEQS, T.HAIRPIN_SPECIAL_LENS,
            T.HAIRPIN_SPECIAL_SCORES,
        )
    }
    conv = {"A": A, "C": C, "G": G, "U": U}

    def k(s):
        return tuple(conv[ch] for ch in s)

    assert specials[k("CAACG")] == kdg(6.80)
    assert specials[k("CCAAGG")] == kdg(3.30)
    assert specials[k("CCUCGG")] == kdg(2.50)
    assert specials[k("ACAGUGUU")] == kdg(1.80)


def test_surrogate_quarantine_registry():
    """Every table is classified exactly once; the SURROGATE class is empty
    since round 3 (VERDICT item 1): dangles + interior/1xN/2x3/multibranch
    mismatch rules are EXACT_PUBLISHED, the hairpin mismatch table is a full
    offline transcription (TRANSCRIBED_PUBLISHED), and the 1x1/1x2/2x2
    tables implement the published generation model (MODEL_GENERATED)."""
    classes = (
        set(T.EXACT_PUBLISHED),
        set(T.TRANSCRIBED_PUBLISHED),
        set(T.MODEL_GENERATED),
        set(T.SURROGATE),
    )
    union = set().union(*classes)
    assert union == set(T.TABLE_NAMES)
    assert sum(len(c) for c in classes) == len(union)  # disjoint
    assert T.SURROGATE == ()
    assert "TERMINAL_MISMATCH_SCORES_HAIRPIN" in T.TRANSCRIBED_PUBLISHED
    assert "INTERIOR_SCORES_1X1" in T.MODEL_GENERATED
    assert "STACK_SCORES" in T.EXACT_PUBLISHED
    assert "DANGLING_SCORES_3PRIME" in T.EXACT_PUBLISHED


# ---------------------------------------------------------------------------
# Round-3 published-value anchors for the previously-surrogate tables.
# Sources named per test; each pins the embedded value against the published
# Turner 2004 free energy (kcal/mol at 37C).
# ---------------------------------------------------------------------------

def test_embedded_dangle_values():
    """NNDB Turner 2004 'dangling ends' tables (Serra & Turner values;
    identical rows in ViennaRNA rna_turner2004.par dangle5/dangle3)."""
    d3, d5 = T.DANGLING_SCORES_3PRIME, T.DANGLING_SCORES_5PRIME
    # 3' dangles: the strong purine stacks
    assert d3[C][G][A] == kdg(-1.10)
    assert d3[C][G][G] == kdg(-1.30)
    assert d3[G][C][A] == kdg(-1.70)  # most stabilizing dangle in the set
    assert d3[G][C][G] == kdg(-1.70)
    assert d3[A][U][A] == kdg(-0.70)
    assert d3[U][A][A] == kdg(-0.80)
    # 5' dangles are weak
    assert d5[C][G][A] == kdg(-0.50)
    assert d5[G][C][G] == kdg(-0.00)
    assert d5[A][U][G] == kdg(-0.40)
    # published wobble-row convention: GU rows copy AU, UG rows copy UA
    np.testing.assert_array_equal(d3[G][U], d3[A][U])
    np.testing.assert_array_equal(d3[U][G], d3[U][A])
    np.testing.assert_array_equal(d5[G][U], d5[A][U])
    np.testing.assert_array_equal(d5[U][G], d5[U][A])


def test_embedded_interior_mismatch_rule():
    """Mathews et al. 2004 (PNAS 101:7287) internal-loop model: sparse first-
    mismatch bonuses A.G/G.A -0.8, U.U -0.7; NO bonus for 1xN loops.  The
    scoring code adds the generic 0.5 helix-end penalty on this path, so the
    AU/UA/GU/UG rows carry the 0.2 kcal/mol closure differential that brings
    the net to the published 0.7 interior-closure value (ADVICE round 3) —
    matching what a ViennaRNA .par ingest nets on the same path."""
    tm = T.TERMINAL_MISMATCH_SCORES_INTERIOR
    for (a, b), extra in (
        ((C, G), 0.0), ((G, C), 0.0), ((A, U), 0.20), ((U, G), 0.20),
        ((U, A), 0.20), ((G, U), 0.20),
    ):
        assert np.isclose(tm[a][b][A][G], kdg(-0.80 + extra), atol=1e-6)
        assert np.isclose(tm[a][b][G][A], kdg(-0.80 + extra), atol=1e-6)
        assert np.isclose(tm[a][b][U][U], kdg(-0.70 + extra), atol=1e-6)
        assert np.isclose(tm[a][b][A][A], kdg(extra), atol=1e-6)
        assert np.isclose(tm[a][b][C][C], kdg(extra), atol=1e-6)
    tm1 = np.asarray(T.TERMINAL_MISMATCH_SCORES_1XMANY)
    for (a, b) in ((C, G), (G, C)):
        assert np.all(tm1[a][b] == 0.0)
    for (a, b) in ((A, U), (U, A), (G, U), (U, G)):
        assert np.allclose(tm1[a][b][:4, :4], kdg(0.20), atol=1e-6)
    np.testing.assert_array_equal(
        T.TERMINAL_MISMATCH_SCORES_2X3, T.TERMINAL_MISMATCH_SCORES_INTERIOR
    )


def test_embedded_multibranch_mismatch_is_dangle_sum():
    """NNDB Turner 2004 multibranch/exterior rule: terminal stacking =
    5' dangle + 3' dangle (the rule that generates RNAstructure tstackm and
    ViennaRNA mismatch_multi/mismatch_exterior)."""
    tm = T.TERMINAL_MISMATCH_SCORES_MULTIBRANCH
    d5, d3 = T.DANGLING_SCORES_5PRIME, T.DANGLING_SCORES_3PRIME
    for (a, b) in ((C, G), (G, C), (A, U), (U, A), (G, U), (U, G)):
        for x in range(4):
            for y in range(4):
                # dangle sum in kcal space, converted once (1 ulp slack vs
                # summing the converted scores)
                assert tm[a][b][x][y] == pytest.approx(
                    d5[a][b][x] + d3[a][b][y], abs=2e-6
                )


def test_embedded_hairpin_mismatch_anchors():
    """Published hairpin terminal-mismatch anchors (NNDB 'hairpin loops'
    terminal mismatch table): the classic stabilized first mismatches on a
    C-G closing pair — G.A, G.G and U.U — and the overall pattern that
    purine (G.) mismatches stack far better than pyrimidine ones."""
    tm = T.TERMINAL_MISMATCH_SCORES_HAIRPIN
    assert tm[C][G][G][A] == kdg(-2.30)
    assert tm[C][G][G][G] == kdg(-2.40)
    assert tm[C][G][U][U] == kdg(-2.10)
    assert tm[G][C][G][C] == kdg(-2.90)
    # sanity structure: every canonical closing pair's G-row mismatches are
    # at least as stabilizing as the C-row ones on average
    for (a, b) in ((C, G), (G, C), (A, U), (U, A), (G, U), (U, G)):
        g_mean = np.mean([tm[a][b][G][y] for y in range(4)])
        c_mean = np.mean([tm[a][b][C][y] for y in range(4)])
        assert g_mean > c_mean  # score space: larger = more stabilizing


def test_embedded_small_interior_model():
    """Published generation model for the 1x1/1x2/2x2 tables (Mathews et al.
    2004 supplement; NNDB 'internal loops' 1x1/2x2 estimation): base
    initiation + 0.7/AU-GU closing pair + measured-class stabilizations,
    closure penalties baked in (the reference adds no helix-end penalty on
    these paths, utils.rs:273-304)."""
    i11 = T.INTERIOR_SCORES_1X1
    # generic 1x1 between CG pairs = 0.9; U.U = -0.4; G.G = -1.4 (net)
    assert i11[C][G][A][A][C][G] == kdg(0.90)
    assert i11[C][G][U][U][C][G] == kdg(0.90 - 1.30)
    assert i11[C][G][G][G][C][G] == kdg(0.90 - 2.30)
    # AU closures add 0.7 each
    assert i11[A][U][A][A][U][A] == kdg(0.90 + 1.40)
    # 1x2: flat 2.7 + closures (1xN side: no mismatch bonuses)
    i21 = T.INTERIOR_SCORES_1X2
    assert i21[C][G][A][A][C][C][G] == kdg(2.70)
    assert i21[G][U][A][A][C][C][G] == kdg(2.70 + 0.70)
    # 2x2: 1.1 base + per-side bonuses
    i22 = T.INTERIOR_SCORES_2X2
    assert i22[C][G][A][A][A][A][C][G] == kdg(1.10)
    assert i22[C][G][G][A][A][G][C][G] == kdg(1.10 - 1.60)
