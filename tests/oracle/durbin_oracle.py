"""Scalar NumPy oracle of the Durbin pair-HMM (test-only).

Faithful float32 re-derivation of `/root/reference/src/durbin_algo.rs:73-242`
with the same streaming logsumexp order.  Sequences must already carry
PSEUDO_BASE sentinels at both ends (bin/durbin_algo.rs:49-50).
"""

import numpy as np

from .numerics_oracle import logsumexp, expf, F

NEG_INF = F(-np.inf)


def durbin_oracle(seq1, seq2, sc):
    n1, n2 = len(seq1), len(seq2)
    fm = np.full((n1, n2), NEG_INF, dtype=np.float32)
    fi = np.full((n1, n2), NEG_INF, dtype=np.float32)
    fd = np.full((n1, n2), NEG_INF, dtype=np.float32)
    bm = np.full((n1, n2), NEG_INF, dtype=np.float32)
    bi = np.full((n1, n2), NEG_INF, dtype=np.float32)
    bd = np.full((n1, n2), NEG_INF, dtype=np.float32)
    m2m = F(sc["match2match_score"])
    m2i = F(sc["match2insert_score"])
    ext = F(sc["insert_extend_score"])
    im = F(sc["init_match_score"])
    ii = F(sc["init_insert_score"])
    MS = sc["match_scores"]
    INS = sc["insert_scores"]

    for i in range(n1 - 1):
        for j in range(n2 - 1):
            if i == 0 and j == 0:
                fm[i][j] = F(0.0)
                continue
            if i > 0 and j > 0:
                s = NEG_INF
                s = logsumexp(s, F(fm[i - 1][j - 1] + (im if (i - 1, j - 1) == (0, 0) else m2m)))
                s = logsumexp(s, F(fi[i - 1][j - 1] + m2i))
                s = logsumexp(s, F(fd[i - 1][j - 1] + m2i))
                fm[i][j] = F(s + MS[seq1[i]][seq2[j]])
            if i > 0:
                s = NEG_INF
                s = logsumexp(s, F(fm[i - 1][j] + (ii if (i - 1, j) == (0, 0) else m2i)))
                s = logsumexp(s, F(fi[i - 1][j] + ext))
                fi[i][j] = F(s + INS[seq1[i]])
            if j > 0:
                s = NEG_INF
                s = logsumexp(s, F(fm[i][j - 1] + (ii if (i, j - 1) == (0, 0) else m2i)))
                s = logsumexp(s, F(fd[i][j - 1] + ext))
                fd[i][j] = F(s + INS[seq2[j]])

    for i in range(n1 - 1, 0, -1):
        for j in range(n2 - 1, 0, -1):
            if i == n1 - 1 and j == n2 - 1:
                bm[i][j] = F(0.0)
                continue
            ends = (i + 1, j + 1) == (n1 - 1, n2 - 1)
            if i < n1 - 1 and j < n2 - 1:
                s = NEG_INF
                s = logsumexp(s, F(bm[i + 1][j + 1] + (F(0.0) if ends else m2m)))
                s = logsumexp(s, F(bi[i + 1][j + 1] + m2i))
                s = logsumexp(s, F(bd[i + 1][j + 1] + m2i))
                bm[i][j] = F(s + MS[seq1[i]][seq2[j]])
            if i < n1 - 1:
                s = NEG_INF
                ends_i = (i + 1, j) == (n1 - 1, n2 - 1)
                s = logsumexp(s, F(bm[i + 1][j] + (F(0.0) if ends_i else m2i)))
                s = logsumexp(s, F(bi[i + 1][j] + ext))
                bi[i][j] = F(s + INS[seq1[i]])
            if j < n2 - 1:
                s = NEG_INF
                ends_j = (i, j + 1) == (n1 - 1, n2 - 1)
                s = logsumexp(s, F(bm[i][j + 1] + (F(0.0) if ends_j else m2i)))
                s = logsumexp(s, F(bd[i][j + 1] + ext))
                bd[i][j] = F(s + INS[seq2[j]])

    z = fm[n1 - 2][n2 - 2]
    z = logsumexp(z, fi[n1 - 2][n2 - 2])
    z = logsumexp(z, fd[n1 - 2][n2 - 2])

    probs = np.zeros((n1, n2), dtype=np.float32)
    for i in range(1, n1 - 1):
        for j in range(1, n2 - 1):
            ends = (i + 1, j + 1) == (n1 - 1, n2 - 1)
            s = NEG_INF
            s = logsumexp(s, F((F(0.0) if ends else m2m) + bm[i + 1][j + 1]))
            s = logsumexp(s, F(m2i + bi[i + 1][j + 1]))
            s = logsumexp(s, F(m2i + bd[i + 1][j + 1]))
            probs[i][j] = expf(F(fm[i][j] + s - z))
    return probs
