"""Brute-force Boltzmann-ensemble enumeration (test-only, tiny sequences).

Independently validates the DP oracle: enumerate every secondary structure
(non-crossing canonical pairs), score it by the models' loop decomposition, and
compute exact base-pairing probabilities in float64.  Structural rules mirror
the ensembles the reference recurrences actually sum over:

* every pair spans >= MIN_SPAN_HAIRPIN_CLOSE (CONTRA: unless allows_short_hairpins),
* hairpin loops: CONTRA requires length <= MAX_LOOP_LEN (no such Turner cap,
  thanks to the extrapolated initiation table),
* a pair with exactly ONE nested branch must satisfy the 2-loop window caps
  (d1 <= cap and d1 + d2 <= cap) - otherwise the structure has zero weight
  (the multibranch path needs >= 2 branches),
* multibranch: Turner  = mb_close + sum(acc + COEFF_NUM_BRANCHES);
  CONTRA = mb_close(+mb_bp) + sum(acc + mb_bp) + mb_unpair * n_unpaired,
* external: Turner = product of acc; CONTRA adds ext_bp per branch and
  ext_unpair per unpaired external base.
"""

import numpy as np

from rna_algos_tpu.constants import (
    MIN_SPAN_HAIRPIN_CLOSE,
    MAX_LOOP_LEN,
    MAX_2LOOP_LEN,
)
from rna_algos_tpu.params import turner as T
from . import fold_oracle as O


def enumerate_structures(seq, min_span):
    """All non-crossing sets of canonical pairs over seq (list of pair tuples)."""
    n = len(seq)
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def rec(i, j):
        # structures on [i, j] inclusive; returns tuple of tuples of pairs
        if j - i + 1 < min_span:
            return ((),)
        out = list(rec(i + 1, j))  # i unpaired
        for k in range(i + min_span - 1, j + 1):
            if not O.is_canonical(seq[i], seq[k]):
                continue
            for inner in rec(i + 1, k - 1):
                for rest in rec(k + 1, j):
                    out.append(((i, k),) + inner + rest)
        return tuple(out)

    return rec(0, n - 1)


def _children(pairs):
    """Map each pair to its directly nested pairs; plus the external branches."""
    by_open = sorted(pairs)
    parent = {}
    stack = []
    events = []
    for (i, j) in by_open:
        events.append((i, 0, (i, j)))
        events.append((j, 1, (i, j)))
    external = []
    children = {p: [] for p in pairs}
    for pos, kind, pair in sorted(events):
        if kind == 0:
            if stack:
                children[stack[-1]].append(pair)
            else:
                external.append(pair)
            stack.append(pair)
        else:
            stack.pop()
    return children, external


def structure_logweight(seq, pairs, model, fss=None):
    """Log-Boltzmann weight of one structure; -inf if outside the ensemble."""
    n = len(seq)
    children, external = _children(pairs)
    cap = MAX_LOOP_LEN if model == "contra" else MAX_2LOOP_LEN

    def close_energy(p):
        i, j = p
        ch = children[p]
        if not ch:
            hlen = j - i - 1
            if model == "contra":
                if hlen > MAX_LOOP_LEN:
                    return -np.inf
                return float(O.hairpin_score_contra(seq, i, j, fss))
            return float(O.hairpin_score_turner(seq, i, j))
        if len(ch) == 1:
            (k, l) = ch[0]
            d1, d2 = k - i - 1, j - l - 1
            if d1 > cap or d1 + d2 > cap:
                return -np.inf
            if model == "contra":
                tl = float(O.twoloop_score_contra(seq, i, j, k, l, fss))
            else:
                tl = float(O.twoloop_score_turner(seq, i, j, k, l))
            return tl + close_energy(ch[0])
        # multibranch
        unpaired = (j - i - 1) - sum(l - k + 1 for (k, l) in ch)
        if model == "contra":
            e = float(
                fss["multibranch_score_base"]
                + fss["multibranch_score_basepair"]
                + O.junction_score(seq, i, j, fss)
            )
            e += float(fss["multibranch_score_unpair"]) * unpaired
            for (k, l) in ch:
                acc = float(
                    O.junction_score(seq, l, k, fss)
                    + fss["basepair_scores"][seq[k]][seq[l]]
                )
                e += acc + float(fss["multibranch_score_basepair"]) + close_energy((k, l))
        else:
            e = float(O.multibranch_close_score_turner(seq, i, j))
            for (k, l) in ch:
                e += (
                    float(O.accessible_score_turner(seq, k, l))
                    + float(T.COEFF_NUM_BRANCHES)
                    + close_energy((k, l))
                )
        return e

    total = 0.0
    ext_unpaired = n - sum(j - i + 1 for (i, j) in external)
    if model == "contra":
        total += float(fss["external_score_unpair"]) * ext_unpaired
        for (i, j) in external:
            total += (
                float(fss["external_score_basepair"])
                + float(
                    O.junction_score(seq, j, i, fss)
                    + fss["basepair_scores"][seq[i]][seq[j]]
                )
                + close_energy((i, j))
            )
    else:
        for (i, j) in external:
            total += float(O.accessible_score_turner(seq, i, j)) + close_energy((i, j))
    return total


def brute_force_bpp(seq, model="turner", fss=None, allows_short_hairpins=False):
    """Exact float64 BPPs by full-ensemble enumeration."""
    seq = [int(b) for b in seq]
    min_span = (
        2 if (model == "contra" and allows_short_hairpins) else MIN_SPAN_HAIRPIN_CLOSE
    )
    structs = enumerate_structures(seq, min_span)
    weights = np.array(
        [structure_logweight(seq, list(p), model, fss) for p in structs]
    )
    wmax = np.max(weights)
    ws = np.exp(weights - wmax)
    Z = ws.sum()
    bpp = {}
    for w, pairs in zip(ws, structs):
        for p in pairs:
            bpp[p] = bpp.get(p, 0.0) + w
    return {p: v / Z for p, v in bpp.items()}, float(np.log(Z) + wmax)
