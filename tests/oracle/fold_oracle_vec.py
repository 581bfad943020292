"""Vectorized float64 true-math McCaskill oracle (test-only).

The scalar oracle (tests/oracle/fold_oracle.py) in ``f64_mode`` is the
ground-truth anchor, but pure-Python cell loops cap it at n ~ 245 (tens of
minutes).  This module re-implements the same recurrences
(`/root/reference/src/mccaskill_algo.rs:282-723`) with per-span NumPy
vectorization in float64 (`np.logaddexp` — no cubic approximations), making
n ~ 768 tractable in minutes, so the 513-1024 fused tier has a true-math
anchor (VERDICT round 2, items 5/9).

Independence: shares only the parameter tables with production code; the DP
arithmetic is NumPy fancy-indexing per span, structured differently from
both the scalar oracle (cell loops) and the production JAX scans (diagonal
layouts).  It is validated cell-for-cell against the scalar f64 oracle at
n=64 by tests/test_oracle.py::test_vec_oracle_matches_scalar_f64 (both
models, <= 1e-7), and the scalar oracle is itself brute-force validated.

Accumulation order differs from the reference's streaming order; in f64 the
reassociation error is ~1e-15, far inside the 1e-6 anchor budget.
"""

import numpy as np

from rna_algos_tpu.constants import (
    A, C, G, U,
    CANONICAL_PAIRS,
    MIN_HAIRPIN_LEN,
    MIN_SPAN_HAIRPIN_CLOSE,
    MAX_LOOP_LEN,
    MAX_2LOOP_LEN,
    MAX_HAIRPIN_LEN_EXTRAPOLATION,
    MIN_HAIRPIN_LEN_EXTRAPOLATION,
    MAX_INTERIOR_EXPLICIT,
)
from rna_algos_tpu.params import turner as T

from . import fold_oracle as FO

NEG = -np.inf


def _lse(a, b):
    return np.logaddexp(a, b)


def _lse_reduce(x, axis):
    with np.errstate(invalid="ignore"):
        out = np.logaddexp.reduce(x, axis=axis)
    # logaddexp.reduce of all -inf is -inf (fine); nan cannot appear: inputs
    # are finite or -inf by the state contract.
    return out


# ---------------------------------------------------------------------------
# Vectorized per-(a,b) 2-loop score grids
# ---------------------------------------------------------------------------

def _twoloop_vec_contra(s, d, a, b, fss):
    """f64 scores of outer (i, j=i+d) with inner (i+1+a, j-1-b), all i."""
    n = len(s)
    m = n - d
    i = np.arange(m)
    j = i + d
    k = i + 1 + a
    l = j - 1 - b
    hc = fss["helix_close_scores"].astype(np.float64)
    tm = fss["terminal_mismatch_scores"].astype(np.float64)
    bp = fss["basepair_scores"].astype(np.float64)
    j1 = hc[s[i], s[j]] + tm[s[i], s[j], s[i + 1], s[j - 1]]
    j2 = hc[s[l], s[k]] + tm[s[l], s[k], s[l + 1], s[k - 1]]
    if a == 0 and b == 0:
        v = fss["stack_scores"].astype(np.float64)[s[i], s[j], s[k], s[l]]
    elif a == 0 or b == 0:
        blen = a + b
        v = np.zeros(m)
        if blen == 1:
            nuc = s[i + 1] if a == 1 else s[j - 1]
            v = fss["bulge_scores_0x1"].astype(np.float64)[nuc]
        v = v + float(fss["bulge_scores_len_cumulative"][blen - 1]) + j1 + j2
    else:
        ilen = a + b
        if a == b:
            v = np.zeros(m)
            if ilen == 2:
                v = fss["interior_scores_1x1"].astype(np.float64)[
                    s[i + 1], s[j - 1]
                ]
            v = v + float(fss["interior_scores_symmetric_cumulative"][a - 1])
        else:
            v = np.full(
                m,
                float(
                    fss["interior_scores_asymmetric_cumulative"][abs(a - b) - 1]
                ),
            )
        if a <= MAX_INTERIOR_EXPLICIT and b <= MAX_INTERIOR_EXPLICIT:
            v = v + float(fss["interior_scores_explicit"][a - 1][b - 1])
        v = (
            v
            + float(fss["interior_scores_len_cumulative"][ilen - 2])
            + j1
            + j2
        )
    return v + bp[s[k], s[l]]


_AUGU_MASK = np.zeros((5, 5), dtype=np.float64)
for _a, _b in ((A, U), (U, A), (G, U), (U, G)):
    _AUGU_MASK[_a, _b] = 1.0


def _twoloop_vec_turner(s, d, a, b, tt):
    n = len(s)
    m = n - d
    i = np.arange(m)
    j = i + d
    k = i + 1 + a
    l = j - 1 - b
    stack = np.asarray(tt["STACK_SCORES"], np.float64)
    pen = float(tt["HELIX_AUGU_END_PENALTY"])
    augu_c = _AUGU_MASK[s[i], s[j]] * pen
    augu_a = _AUGU_MASK[s[k], s[l]] * pen
    if a == 0 and b == 0:
        return stack[s[i], s[j], s[k], s[l]]
    if a == 0 or b == 0:
        blen = a + b
        binit = np.asarray(tt["BULGE_SCORES_INIT"], np.float64)
        if blen == 1:
            return binit[1] + stack[s[i], s[j], s[k], s[l]]
        return binit[blen] + augu_c + augu_a
    if (a, b) == (1, 1):
        t = np.asarray(tt["INTERIOR_SCORES_1X1"], np.float64)
        return t[s[i], s[j], s[i + 1], s[j - 1], s[k], s[l]]
    if (a, b) == (1, 2):
        t = np.asarray(tt["INTERIOR_SCORES_1X2"], np.float64)
        return t[s[i], s[j], s[i + 1], s[j - 1], s[j - 2], s[k], s[l]]
    if (a, b) == (2, 1):
        t = np.asarray(tt["INTERIOR_SCORES_1X2"], np.float64)
        return t[s[l], s[k], s[j - 1], s[i + 2], s[i + 1], s[j], s[i]]
    if (a, b) == (2, 2):
        t = np.asarray(tt["INTERIOR_SCORES_2X2"], np.float64)
        return t[s[i], s[j], s[i + 1], s[j - 1], s[i + 2], s[j - 2], s[k], s[l]]
    if a == 1 or b == 1:
        tmt = np.asarray(tt["TERMINAL_MISMATCH_SCORES_1XMANY"], np.float64)
    elif (a, b) in ((2, 3), (3, 2)):
        tmt = np.asarray(tt["TERMINAL_MISMATCH_SCORES_2X3"], np.float64)
    else:
        tmt = np.asarray(tt["TERMINAL_MISMATCH_SCORES_INTERIOR"], np.float64)
    mism = (
        tmt[s[i], s[j], s[i + 1], s[j - 1]]
        + tmt[s[l], s[k], s[l + 1], s[k - 1]]
    )
    iinit = np.asarray(tt["INTERIOR_SCORES_INIT"], np.float64)
    # the scalar oracle forms the NINIO product in f32 before widening
    # (F() wraps the already-rounded np.float32 * int product) — match it
    ninio = max(
        float(np.float32(tt["NINIO_COEFF"]) * np.float32(abs(a - b))),
        float(tt["NINIO_MAX"]),
    )
    return iinit[a + b] + ninio + mism + augu_c + augu_a


# ---------------------------------------------------------------------------
# Inside + outside (vectorized per span)
# ---------------------------------------------------------------------------

def _scalar_grids(seq, model, fss):
    """H/MBC/ACC per (i, j) via the scalar scoring functions (O(n^2)),
    evaluated in true-math f64 (f64_mode wraps the scalar F())."""
    from .numerics_oracle import f64_mode

    with f64_mode():
        return _scalar_grids_inner(seq, model, fss)


def _scalar_grids_inner(seq, model, fss):
    n = len(seq)
    Hm = np.full((n, n), NEG)
    MBCm = np.full((n, n), NEG)
    ACCm = np.full((n, n), NEG)
    canon = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(i + 1, n):
            if not FO.is_canonical(seq[i], seq[j]):
                continue
            canon[i, j] = True
            if model == "contra":
                if j - i - 1 <= MAX_LOOP_LEN:
                    Hm[i, j] = FO.hairpin_score_contra(seq, i, j, fss)
                MBCm[i, j] = (
                    float(fss["multibranch_score_base"])
                    + float(fss["multibranch_score_basepair"])
                    + FO.junction_score(seq, i, j, fss)
                )
                ACCm[i, j] = FO.junction_score(seq, j, i, fss) + float(
                    fss["basepair_scores"][seq[i]][seq[j]]
                )
            else:
                Hm[i, j] = FO.hairpin_score_turner(seq, i, j)
                MBCm[i, j] = FO.multibranch_close_score_turner(seq, i, j)
                ACCm[i, j] = FO.accessible_score_turner(seq, i, j)
    return Hm, MBCm, ACCm, canon


def mccaskill_oracle_vec(seq, uses_contra_model=False,
                         allows_short_hairpins=False, fss=None):
    """(bpp (n,n) f64, Z) — true-math BPPs for one integer sequence."""
    seq = np.asarray(seq, dtype=np.int64)
    s = seq
    n = len(seq)
    contra = uses_contra_model
    model = "contra" if contra else "turner"
    if contra:
        assert fss is not None
        fss = {k: np.asarray(v) for k, v in fss.items()}
        tl_vec = lambda d, a, b: _twoloop_vec_contra(s, d, a, b, fss)
        max2 = MAX_LOOP_LEN
        eu = float(fss["external_score_unpair"])
        ebp = float(fss["external_score_basepair"])
        mbu = float(fss["multibranch_score_unpair"])
        mbbp = float(fss["multibranch_score_basepair"])
    else:
        tt = {k: np.asarray(v) for k, v in T.active_tables().items()}
        tl_vec = lambda d, a, b: _twoloop_vec_turner(s, d, a, b, tt)
        max2 = MAX_2LOOP_LEN
        coeff = float(T.COEFF_NUM_BRANCHES)

    Hm, MBCm, ACCm, canon = _scalar_grids(
        [int(x) for x in seq], model, fss if contra else None
    )

    close = np.full((n, n), NEG)
    acc = np.full((n, n), NEG)
    rm = np.full((n, n), NEG)
    rmmb = np.full((n, n), NEG)
    ext = np.zeros((n, n))
    mb = np.full((n, n), NEG)
    one = np.full((n, n), NEG)

    min_close = MIN_SPAN_HAIRPIN_CLOSE
    if contra and allows_short_hairpins:
        min_close = 2

    for span in range(1, n + 1):
        d = span - 1
        m = n - d
        i = np.arange(m)
        j = i + d
        # --- close ---
        if span >= min_close:
            sacc = Hm[i, j].copy()
            for a in range(0, min(max2, d - 2) + 1):
                for b in range(0, max2 - a + 1):
                    dd = d - 2 - a - b
                    if dd < 1:
                        break
                    inner = close[i + 1 + a, j - 1 - b]
                    valid = np.isfinite(inner)
                    if not valid.any():
                        continue
                    tl = tl_vec(d, a, b)
                    sacc = np.where(
                        valid, _lse(sacc, inner + tl), sacc
                    )
            if d >= 2:
                sacc = _lse(sacc, mb[i + 1, j - 1] + MBCm[i, j])
            ok = canon[i, j] & np.isfinite(sacc)
            close[i, j] = np.where(ok, sacc, NEG)
            acc[i, j] = np.where(ok, sacc + ACCm[i, j], NEG)
        # --- rightmost-basepair sums ---
        # rm[i, j] = lse over k in (i, j] of acc[i, k] (+ weights)
        prev_rm = rm[i, j - 1] if d >= 1 else np.full(m, NEG)
        prev_rmmb = rmmb[i, j - 1] if d >= 1 else np.full(m, NEG)
        if contra:
            rm[i, j] = _lse(prev_rm + eu, acc[i, j] + ebp)
            rmmb[i, j] = _lse(prev_rmmb + mbu, acc[i, j] + mbbp)
        else:
            rm[i, j] = _lse(prev_rm, acc[i, j])
        # --- external: k in [i, j) ---
        t = np.arange(d) if d else np.arange(0)
        if d:
            kk = i[:, None] + t[None, :]
            x = rm[kk, j[:, None]]
            y = np.where(
                (i[:, None] == 0) & (kk == 0), 0.0, ext[i[:, None], kk - 1]
            )
            red = _lse_reduce(x + y, axis=1)
        else:
            red = np.full(m, NEG)
        base = eu * span if contra else 0.0
        ext[i, j] = _lse(np.full(m, base), red)
        # --- multibranch / one-or-more: t = k - i in [1, d-1] ---
        if d >= 2:
            t = np.arange(1, d)
            kk = i[:, None] + t[None, :]
            if contra:
                x = rmmb[kk, j[:, None]]
                s1 = _lse(
                    rmmb[i, j],
                    _lse_reduce(x + mbu * t[None, :], axis=1),
                )
            else:
                x = rm[kk, j[:, None]] + coeff
                s1 = _lse(rm[i, j] + coeff, _lse_reduce(x, axis=1))
            s2 = _lse_reduce(one[i[:, None], kk - 1] + x, axis=1)
        else:
            s1 = (rmmb[i, j] if contra else rm[i, j] + coeff).copy()
            s2 = np.full(m, NEG)
        mb[i, j] = s2
        one[i, j] = _lse(s1, s2)

    # ------------------------------------------------------------------ outside
    Z = ext[0, n - 1]
    bppo = np.full((n, n), NEG)
    pm = np.full((n, n), NEG)
    pm2 = np.full((n, n), NEG)
    extL = ext[0, :]
    extR = ext[:, n - 1]
    min_span = 2 if (contra and allows_short_hairpins) else MIN_SPAN_HAIRPIN_CLOSE

    for span in range(n, min_span - 1, -1):
        d = span - 1
        m = n - d
        i = np.arange(m)
        j = i + d
        # --- pm / pm2: k > j ---
        nk = n - 1 - j[0] - 1  # max count at i=0
        if n - 1 > j[0]:
            t = np.arange(1, n - d)  # k = j + t
            kk = j[:, None] + t[None, :]
            vk = kk < n
            kkc = np.minimum(kk, n - 1)
            g = np.where(
                vk & np.isfinite(close[i[:, None], kkc]),
                bppo[i[:, None], kkc]
                + MBCm[i[:, None], kkc]
                - close[i[:, None], kkc],
                NEG,
            )
            onemid = np.where(
                kk - 1 >= j[:, None] + 1,
                one[np.minimum(j[:, None] + 1, n - 1), np.maximum(kkc - 1, 0)],
                NEG,
            )
            pm[i, j] = _lse_reduce(g + onemid, axis=1)
            if contra:
                pm2[i, j] = _lse_reduce(g + mbu * (t[None, :] - 1.0), axis=1)
            else:
                pm2[i, j] = _lse_reduce(g, axis=1)
        # --- bpp outside ---
        fin = np.isfinite(close[i, j])
        if not fin.any():
            continue
        lt = np.where(i >= 1, extL[np.maximum(i - 1, 0)], 0.0)
        rt = np.where(j <= n - 2, extR[np.minimum(j + 1, n - 1)], 0.0)
        sacc = lt + rt + acc[i, j] - Z
        if contra:
            sacc = sacc + ebp
        # 2-loop context: outer (i-1-a, j+1+b)
        for a in range(0, max2 + 1):
            for b in range(0, max2 - a + 1):
                ko = i - 1 - a
                lo = j + 1 + b
                valid = (ko >= 0) & (lo <= n - 1)
                if not valid.any():
                    continue
                koc = np.maximum(ko, 0)
                loc = np.minimum(lo, n - 1)
                outer_fin = valid & np.isfinite(close[koc, loc])
                if not outer_fin.any():
                    continue
                # score of outer (ko, lo) enclosing inner (i, j): offsets
                # (a, b) at outer span d + 2 + a + b
                tl_full = tl_vec(d + 2 + a + b, a, b)
                # tl_full is indexed by the OUTER left end ko = 0..n-span';
                # clamp for masked lanes (ko of an invalid lane can exceed it)
                tl = np.where(
                    outer_fin,
                    tl_full[np.clip(ko, 0, len(tl_full) - 1)],
                    0.0,
                )
                term = np.where(
                    outer_fin,
                    bppo[koc, loc] + close[i, j] - close[koc, loc] + tl,
                    NEG,
                )
                sacc = _lse(sacc, term)
        # multibranch context: k < i
        if i[-1] >= 1:
            acc_mb = acc[i, j] + (mbbp if contra else coeff)
            t = np.arange(1, n - d)  # t = i - k
            kk = i[:, None] - t[None, :]
            vk = kk >= 0
            kkc = np.maximum(kk, 0)
            x = np.where(
                vk & (kk + 1 <= i[:, None] - 1),
                one[np.minimum(kkc + 1, n - 1), np.maximum(i[:, None] - 1, 0)],
                NEG,
            )
            y = np.where(vk, pm[kkc, j[:, None]], NEG)
            y2 = np.where(vk, pm2[kkc, j[:, None]], NEG)
            ta = _lse_reduce(y2 + x, axis=1)
            if contra:
                tb = _lse_reduce(
                    np.where(vk, y + mbu * (t[None, :] - 1.0), NEG), axis=1
                )
            else:
                tb = _lse_reduce(y, axis=1)
            tc = _lse_reduce(x + y, axis=1)
            mb_ctx = acc_mb + _lse(_lse(ta, tb), tc)
            sacc = _lse(sacc, mb_ctx)
        bppo[i, j] = np.where(fin, sacc, NEG)

    with np.errstate(over="ignore"):
        bpp = np.where(np.isfinite(bppo), np.exp(bppo), 0.0)
    return bpp, Z
