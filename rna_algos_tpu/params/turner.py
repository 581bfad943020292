"""Turner 2004 nearest-neighbor scoring tables.

Re-creation of the `rna_ss_params::compiled_scores_turner` interface consumed by the
reference (see `/root/reference/src/utils.rs:162-411` for every access site).  The
reference pulls these from the external `rna-ss-params` crate (not vendored); here the
tables are rebuilt from the public Turner 2004 NNDB free energies (kcal/mol at 37C)
and converted to dimensionless log-Boltzmann scores via ``score = -dG / RT``.

Indexing conventions (identical to the reference's access patterns):

* ``STACK_SCORES[a][b][c][d]``: closing pair (a,b), accessible pair (c,d), i.e. the
  2x2 motif 5'-a c-3' / 3'-b d-5' (utils.rs:224-232).
* ``TERMINAL_MISMATCH_*[a][b][x][y]``: pair (a,b) with x the loop base 3'-adjacent
  to a and y the loop base 5'-adjacent to b (utils.rs:186,331-366,373,394).
* ``DANGLING_SCORES_5PRIME[a][b][x]``: x dangles on the 5' side of pair (a,b)
  (utils.rs:397); ``_3PRIME`` the 3' side (utils.rs:400).
* Length tables are indexed by loop length directly (utils.rs:175,246,306).

All base-indexed tables carry a fifth, score-neutral slot for ``PSEUDO_BASE`` so
padded batch tensors can be gathered without masking.

PROVENANCE / ACCURACY (full matrix in PARAMS.md; machine-readable split in
EXACT_PUBLISHED / SURROGATE below, enforced by tests/test_params_vienna.py):
the stack table (Watson-Crick AND GU-containing doubles), loop-length
initiation tables, special tri/tetra/hexaloop list, NINIO, AU/GU helix-end
penalty, multibranch affine weights and the extrapolation coefficient carry
the published Turner 2004 values verbatim.  The terminal mismatches, GU/UG
dangle rows and the 1x1/1x2/2x2 interior tables are best-effort
reconstructions (no network access to the NNDB dump); they are structurally
exact but numerically approximate.  `rna_algos_tpu.params.vienna` ingests a
ViennaRNA `rna_turner2004.par` to replace every table with exact published
values — set ``RNA_ALGOS_TURNER_PARAMS=/path/to/rna_turner2004.par`` or call
``set_tables()``.
"""

import math
import os

import numpy as np

from ..constants import (
    A,
    C,
    G,
    U,
    NUM_BASES_PAD,
    CANONICAL_PAIRS,
    RT,
    NEG_INF,
)

_B = NUM_BASES_PAD


def dg(x):
    """kcal/mol -> log-Boltzmann score."""
    return -x / RT


def _table(shape, fill=0.0):
    return np.full(shape, fill, dtype=np.float32)


# ---------------------------------------------------------------------------
# Stacks: all 21 unique published Turner 2004 nearest-neighbor doubles
# (10 Watson-Crick + 11 GU-containing), closed under the strand-reversal
# symmetry dG(a,b,c,d) == dG(d,c,b,a).
# ---------------------------------------------------------------------------
_STACK_DG = {
    # (a, b, c, d): dG37  for 5'-a c-3' / 3'-b d-5'
    (A, U, A, U): -0.93,
    (A, U, U, A): -1.10,
    (U, A, A, U): -1.33,
    (C, G, U, A): -2.08,
    (C, G, A, U): -2.11,
    (G, C, U, A): -2.24,
    (G, C, A, U): -2.35,
    (C, G, G, C): -2.36,
    (C, G, C, G): -3.26,
    (G, C, C, G): -3.42,
    # GU-containing stacks (published Turner 2004 values), closed under the
    # strand-reversal symmetry below.
    (A, U, G, U): -0.55,
    (A, U, U, G): -1.36,
    (C, G, G, U): -1.41,
    (C, G, U, G): -2.11,
    (G, C, G, U): -1.53,
    (G, C, U, G): -2.51,
    (G, U, A, U): -1.27,
    (U, A, G, U): -1.00,
    (G, U, G, U): -0.50,
    (G, U, U, G): +1.29,
    (U, G, G, U): +0.30,
    (U, G, U, G): -0.50,
}


def _close_symmetry(d):
    out = dict(d)
    for (a, b, c, e), v in d.items():
        key = (e, c, b, a)
        out.setdefault(key, v)
    return out


def build_stack_scores():
    t = _table((_B, _B, _B, _B))
    for (a, b, c, d), v in _close_symmetry(_STACK_DG).items():
        t[a][b][c][d] = dg(v)
    return t


STACK_SCORES = build_stack_scores()

# ---------------------------------------------------------------------------
# Loop-length initiation tables (Turner 2004; index = loop length).
# Lengths beyond the measured range follow the published Jacobson-Stockmayer
# extrapolation with coefficient 1.75*RT (already applied below for bulge and
# interior so plain indexing suffices up to MAX_2LOOP_LEN).
# ---------------------------------------------------------------------------
_HAIRPIN_INIT_DG = [
    math.inf, math.inf, math.inf,
    5.40, 5.60, 5.70, 5.40, 6.00, 5.50, 6.40, 6.50,
    6.60, 6.70, 6.78, 6.86, 6.94, 7.01, 7.07, 7.13, 7.19, 7.25,
    7.30, 7.35, 7.40, 7.44, 7.49, 7.53, 7.57, 7.61, 7.65, 7.69,
]
HAIRPIN_SCORES_INIT = np.array([dg(x) for x in _HAIRPIN_INIT_DG], dtype=np.float32)

_BULGE_INIT_DG = [
    math.inf,
    3.80, 2.80, 3.20, 3.60, 4.00, 4.40, 4.59, 4.70, 4.80, 4.90,
    5.00, 5.10, 5.19, 5.27, 5.34, 5.41, 5.48, 5.54, 5.60, 5.65,
    5.71, 5.76, 5.80, 5.85, 5.89, 5.94, 5.98, 6.02, 6.05, 6.09,
]
BULGE_SCORES_INIT = np.array([dg(x) for x in _BULGE_INIT_DG], dtype=np.float32)

_INTERIOR_INIT_DG = [
    math.inf, math.inf, math.inf, math.inf,
    1.10, 2.00, 2.00, 2.10, 2.30, 2.40, 2.50,
    2.60, 2.70, 2.78, 2.86, 2.94, 3.01, 3.07, 3.13, 3.19, 3.25,
    3.30, 3.35, 3.40, 3.45, 3.49, 3.53, 3.57, 3.61, 3.65, 3.69,
]
INTERIOR_SCORES_INIT = np.array([dg(x) for x in _INTERIOR_INIT_DG], dtype=np.float32)

# Hairpin length extrapolation (utils.rs:178-184): for len > 30,
# init[30] + COEFF * ln(len / 30); COEFF in score space is -1.75 (i.e. +1.75*RT
# kcal/mol in free-energy space).
COEFF_HAIRPIN_LEN_EXTRAPOLATION = np.float32(-1.75)

# ---------------------------------------------------------------------------
# NINIO asymmetric-interior penalty and helix-end penalty.
# Reference applies (NINIO_COEFF * |l1-l2|).max(NINIO_MAX) (utils.rs:307).
# ---------------------------------------------------------------------------
NINIO_COEFF = np.float32(dg(0.60))
NINIO_MAX = np.float32(dg(3.00))
HELIX_AUGU_END_PENALTY = np.float32(dg(0.50))

# Multibranch affine model (utils.rs:375, mccaskill_algo.rs:364):
# dG = a + c * branches; Turner 2004 a = 9.3, c = -0.9 kcal/mol (no per-unpaired
# term). The closing pair's branch cost is carried by COEFF_NUM_BRANCHES at the
# accessible side exactly as in the reference recurrences.
INIT_MULTIBRANCH_BASE = np.float32(dg(9.30))
COEFF_NUM_BRANCHES = np.float32(dg(-0.90))

# ---------------------------------------------------------------------------
# Dangles (best-effort Turner 2004 values).
# ---------------------------------------------------------------------------
_DANGLE3_DG = {
    # pair (a,b) -> [A, C, G, U] dangling 3' of a.
    (C, G): [-1.10, -0.40, -1.30, -0.60],
    (G, C): [-1.70, -0.80, -1.70, -1.20],
    (G, U): [-0.80, -0.50, -0.80, -0.60],
    (U, G): [-0.70, -0.10, -0.70, -0.10],
    (A, U): [-0.70, -0.10, -0.70, -0.10],
    (U, A): [-0.80, -0.50, -0.80, -0.60],
}
_DANGLE5_DG = {
    (C, G): [-0.50, -0.30, -0.20, -0.10],
    (G, C): [-0.20, -0.30, -0.00, -0.00],
    (G, U): [-0.20, -0.20, -0.20, -0.20],
    (U, G): [-0.30, -0.10, -0.20, -0.20],
    (A, U): [-0.30, -0.10, -0.20, -0.20],
    (U, A): [-0.30, -0.30, -0.40, -0.20],
}


def _build_dangles(table_dg):
    t = _table((_B, _B, _B))
    for (a, b), row in table_dg.items():
        for x, v in enumerate(row):
            t[a][b][x] = dg(v)
    return t


DANGLING_SCORES_5PRIME = _build_dangles(_DANGLE5_DG)
DANGLING_SCORES_3PRIME = _build_dangles(_DANGLE3_DG)

# ---------------------------------------------------------------------------
# Terminal mismatch tables. Constructed from the dangle tables plus published
# first-mismatch bonuses (GA / UU / GG stabilization) — structurally exact,
# numerically approximate (see module docstring).
# ---------------------------------------------------------------------------
_FIRST_MISMATCH_BONUS_DG = {
    (G, A): -0.80,
    (A, G): -0.30,
    (G, G): -1.20,
    (U, U): -0.60,
}


def _build_terminal_mismatch(scale=1.0, extra=0.0):
    t = _table((_B, _B, _B, _B))
    for (a, b) in CANONICAL_PAIRS:
        for x in range(4):
            for y in range(4):
                v = (
                    _DANGLE3_DG[(a, b)][x]
                    + _DANGLE5_DG[(a, b)][y]
                    + _FIRST_MISMATCH_BONUS_DG.get((x, y), 0.0)
                )
                t[a][b][x][y] = dg(scale * v + extra)
    return t


TERMINAL_MISMATCH_SCORES_HAIRPIN = _build_terminal_mismatch()
TERMINAL_MISMATCH_SCORES_INTERIOR = _build_terminal_mismatch(scale=0.7)
TERMINAL_MISMATCH_SCORES_1XMANY = _build_terminal_mismatch(scale=0.4)
TERMINAL_MISMATCH_SCORES_2X3 = _build_terminal_mismatch(scale=0.6)
# Multibranch/external mismatches are the sum of both dangles in Turner 2004.
TERMINAL_MISMATCH_SCORES_MULTIBRANCH = _build_terminal_mismatch(scale=1.0)

# ---------------------------------------------------------------------------
# Special hairpins (utils.rs:198-205): full subsequence including the closing
# pair -> total loop free energy. Published Turner 2004 tri/tetra/hexaloop
# tables (2 + 16 + 4 entries).
# ---------------------------------------------------------------------------
_SPECIAL_HAIRPINS_DG = [
    ("CAACG", 6.80),
    ("GUUAC", 6.90),
    ("CAACGG", 5.50),
    ("CCAAGG", 3.30),
    ("CCACGG", 3.70),
    ("CCCAGG", 3.40),
    ("CCGAGG", 3.50),
    ("CCGCGG", 3.60),
    ("CCUAGG", 3.70),
    ("CCUCGG", 2.50),
    ("CUAAGG", 3.60),
    ("CUACGG", 2.80),
    ("CUCAGG", 3.70),
    ("CUCCGG", 2.70),
    ("CUGCGG", 2.80),
    ("CUUAGG", 3.50),
    ("CUUCGG", 3.70),
    ("CUUUGG", 3.70),
    ("ACAGUGCU", 2.90),
    ("ACAGUGAU", 3.60),
    ("ACAGUGUU", 1.80),
    ("ACAGUACU", 2.80),
]

_BASE_FROM_CHAR = {"A": A, "C": C, "G": G, "U": U}


def build_special_hairpins():
    """Return (padded int array [S, Lmax], lengths [S], scores [S])."""
    seqs = [[_BASE_FROM_CHAR[ch] for ch in s] for s, _ in _SPECIAL_HAIRPINS_DG]
    scores = np.array([dg(v) for _, v in _SPECIAL_HAIRPINS_DG], dtype=np.float32)
    lmax = max(len(s) for s in seqs)
    arr = np.full((len(seqs), lmax), -1, dtype=np.int32)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = s
        lens[i] = len(s)
    return arr, lens, scores


HAIRPIN_SPECIAL_SEQS, HAIRPIN_SPECIAL_LENS, HAIRPIN_SPECIAL_SCORES = (
    build_special_hairpins()
)

# ---------------------------------------------------------------------------
# Small interior-loop tables: 1x1, 1x2, 2x2 (utils.rs:273-304).
# Built from a generic model (loop initiation + terminal mismatches + AU/GU
# ends) with the published GG / UU 1x1 stabilizations; exact published tables
# can be loaded via params.vienna.
# ---------------------------------------------------------------------------


def _augu(a, b):
    return 0.50 if (a, b) in ((A, U), (U, A), (G, U), (U, G)) else 0.0


def build_interior_1x1():
    t = _table((_B, _B, _B, _B, _B, _B))
    for (a, b) in CANONICAL_PAIRS:
        for (c, d) in CANONICAL_PAIRS:
            for x in range(4):
                for y in range(4):
                    v = 1.70 + _augu(a, b) + _augu(c, d)
                    v += _FIRST_MISMATCH_BONUS_DG.get((x, y), 0.0)
                    # index: [close][x, y mismatch][accessible]
                    t[a][b][x][y][c][d] = dg(v)
    return t


def build_interior_1x2():
    t = _table((_B, _B, _B, _B, _B, _B, _B))
    for (a, b) in CANONICAL_PAIRS:
        for (c, d) in CANONICAL_PAIRS:
            for x in range(4):
                for y in range(4):
                    for z in range(4):
                        v = 2.70 + _augu(a, b) + _augu(c, d)
                        v += _FIRST_MISMATCH_BONUS_DG.get((x, y), 0.0)
                        t[a][b][x][y][z][c][d] = dg(v)
    return t


def build_interior_2x2():
    t = _table((_B, _B, _B, _B, _B, _B, _B, _B))
    for (a, b) in CANONICAL_PAIRS:
        for (c, d) in CANONICAL_PAIRS:
            for x in range(4):
                for y in range(4):
                    for x2 in range(4):
                        for y2 in range(4):
                            v = 2.80 + _augu(a, b) + _augu(c, d)
                            v += _FIRST_MISMATCH_BONUS_DG.get((x, y), 0.0)
                            v += _FIRST_MISMATCH_BONUS_DG.get((x2, y2), 0.0)
                            t[a][b][x][y][x2][y2][c][d] = dg(v)
    return t


INTERIOR_SCORES_1X1 = build_interior_1x1()
INTERIOR_SCORES_1X2 = build_interior_1x2()
INTERIOR_SCORES_2X2 = build_interior_2x2()

# ---------------------------------------------------------------------------
# Table registry + drop-in replacement (PARAMS.md).
#
# EXACT_PUBLISHED tables carry the published Turner 2004 values verbatim
# (cross-checked against the NNDB / ViennaRNA rna_turner2004.par layout);
# SURROGATE tables are structurally exact but numerically reconstructed —
# replace them by pointing RNA_ALGOS_TURNER_PARAMS at a ViennaRNA .par file
# (params/vienna.py) or by calling set_tables().
# ---------------------------------------------------------------------------

TABLE_NAMES = (
    "STACK_SCORES",
    "HAIRPIN_SCORES_INIT",
    "BULGE_SCORES_INIT",
    "INTERIOR_SCORES_INIT",
    "COEFF_HAIRPIN_LEN_EXTRAPOLATION",
    "NINIO_COEFF",
    "NINIO_MAX",
    "HELIX_AUGU_END_PENALTY",
    "INIT_MULTIBRANCH_BASE",
    "COEFF_NUM_BRANCHES",
    "DANGLING_SCORES_5PRIME",
    "DANGLING_SCORES_3PRIME",
    "TERMINAL_MISMATCH_SCORES_HAIRPIN",
    "TERMINAL_MISMATCH_SCORES_INTERIOR",
    "TERMINAL_MISMATCH_SCORES_1XMANY",
    "TERMINAL_MISMATCH_SCORES_2X3",
    "TERMINAL_MISMATCH_SCORES_MULTIBRANCH",
    "HAIRPIN_SPECIAL_SEQS",
    "HAIRPIN_SPECIAL_LENS",
    "HAIRPIN_SPECIAL_SCORES",
    "INTERIOR_SCORES_1X1",
    "INTERIOR_SCORES_1X2",
    "INTERIOR_SCORES_2X2",
)

EXACT_PUBLISHED = (
    "STACK_SCORES",
    "HAIRPIN_SCORES_INIT",
    "BULGE_SCORES_INIT",
    "INTERIOR_SCORES_INIT",
    "COEFF_HAIRPIN_LEN_EXTRAPOLATION",
    "NINIO_COEFF",
    "NINIO_MAX",
    "HELIX_AUGU_END_PENALTY",
    "INIT_MULTIBRANCH_BASE",
    "COEFF_NUM_BRANCHES",
    "HAIRPIN_SPECIAL_SEQS",
    "HAIRPIN_SPECIAL_LENS",
    "HAIRPIN_SPECIAL_SCORES",
)

SURROGATE = tuple(n for n in TABLE_NAMES if n not in EXACT_PUBLISHED)


def default_tables():
    """The embedded tables as a dict (copies are NOT made; treat read-only)."""
    return {name: globals()[name] for name in TABLE_NAMES}


_active = None


def active_tables():
    """Embedded defaults, overridden by RNA_ALGOS_TURNER_PARAMS (.par file)
    and/or a prior set_tables() call.  Cached after first use."""
    global _active
    if _active is None:
        tabs = default_tables()
        path = os.environ.get("RNA_ALGOS_TURNER_PARAMS")
        if path:
            from . import vienna

            tabs.update(
                (k, v)
                for k, v in vienna.load_turner_params(path).items()
                if k in tabs
            )
        _active = tabs
    return _active


def set_tables(overrides=None):
    """Install table overrides (dict keyed by TABLE_NAMES) or reset (None).

    Callers must rebuild any jit-captured table pytrees afterwards
    (ops.scores.turner_table_pytree reads active_tables() at call time).
    """
    global _active
    if overrides is None:
        _active = None
        return
    tabs = default_tables()
    unknown = set(overrides) - set(TABLE_NAMES)
    if unknown:
        raise KeyError(f"unknown Turner table names: {sorted(unknown)}")
    tabs.update(overrides)
    _active = tabs
