"""Scalar NumPy oracle of the gamma-centroid MEA fill (test-only).

Literal re-derivation of `/root/reference/src/centroid_fold.rs:35-64` in
float32 scalar order: cell (i, j) takes the max of drop-left, drop-right,
pair (M[i+1][j-1] + gamma*p - 1, only when p(i, j) > 0) and all bifurcations
M[i][k] + M[k+1][j].  Used by the centroid identity test: the device fill
(models/centroid.py) must reproduce these float32 values so the
float-equality traceback re-derivation holds.
"""

import numpy as np

F = np.float32


def mea_fill_oracle(bpp, n, gamma):
    """(n, n) float32 MEA fill (upper triangle; diagonal 0).

    The bifurcation max is evaluated as a vectorized f32 elementwise add +
    max — identical values to the reference's scalar loop (f32 add is the
    same operation either way; max is order-free)."""
    bpp = np.asarray(bpp, dtype=np.float32)
    gamma = F(gamma)
    one = F(1.0)
    M = np.zeros((n, n), dtype=np.float32)
    for d in range(1, n):
        for i in range(0, n - d):
            j = i + d
            best = M[i + 1, j] if i + 1 <= j else F(0.0)
            best = max(best, M[i, j - 1])
            if bpp[i, j] > 0.0:
                inner = M[i + 1, j - 1] if i + 1 <= j - 1 else F(0.0)
                best = max(best, F((inner + F(gamma * bpp[i, j])) - one))
            if j > i + 1:
                # max_k M[i][k] + M[k+1][j], k in (i, j)
                cand = M[i, i + 1 : j] + M[i + 2 : j + 1, j]
                best = max(best, cand.max())
            M[i, j] = best
    return M
