"""Centroid MEA estimator: device fill vs scalar fill, traceback semantics."""

import numpy as np
import jax.numpy as jnp

from rna_algos_tpu.models.centroid import (
    DEFAULT_GAMMAS,
    centroid_fold,
    mea_fill,
    mea_fill_gammas,
)


def _scalar_fill(bpp, n, gamma):
    """Direct scalar re-derivation of centroid_fold.rs:35-64 (f32)."""
    M = np.zeros((n, n), dtype=np.float32)
    g = np.float32(gamma)
    for span in range(1, n + 1):
        for i in range(0, n - span + 1):
            j = i + span - 1
            if i == j:
                continue
            best = M[i + 1][j] if i + 1 < n else np.float32(0.0)
            if M[i][j - 1] > best:
                best = M[i][j - 1]
            if bpp[i][j] > 0.0:
                v = np.float32(
                    (np.float32(M[i + 1][j - 1] if i + 1 <= j - 1 else 0.0) + g * bpp[i][j])
                    - np.float32(1.0)
                )
                if v > best:
                    best = v
            for k in range(i + 1, j):
                v = np.float32(M[i][k] + M[k + 1][j])
                if v > best:
                    best = v
            M[i][j] = best
    return M


def _random_bpp(rng, n, N):
    bpp = np.zeros((N, N), dtype=np.float32)
    for _ in range(3 * n):
        i, j = sorted(rng.integers(0, n, size=2))
        if j > i + 3:
            bpp[i, j] = rng.random(dtype=np.float32)
    return bpp


def test_mea_fill_matches_scalar():
    rng = np.random.default_rng(11)
    N = 32
    for _ in range(4):
        n = int(rng.integers(10, 30))
        bpp = _random_bpp(rng, n, N)
        for gamma in (1.0, 4.0, 0.125):
            M = np.asarray(mea_fill(jnp.asarray(bpp), gamma, N=N))
            ref = _scalar_fill(bpp, n, gamma)
            np.testing.assert_array_equal(M[:n, :n], ref)


def test_traceback_valid_structure():
    rng = np.random.default_rng(5)
    N = 32
    n = 28
    bpp = _random_bpp(rng, n, N)
    for gamma in (0.5, 2.0, 16.0):
        pairs, ea = centroid_fold(bpp, n, gamma)
        used = set()
        for i, j in pairs:
            assert 0 <= i < j < n
            assert bpp[i, j] > 0.0
            assert i not in used and j not in used
            used.update((i, j))
        # nesting: no crossing pairs
        for (i1, j1) in pairs:
            for (i2, j2) in pairs:
                if i1 < i2:
                    assert j2 < j1 or i2 > j1
        M = _scalar_fill(bpp, n, gamma)
        assert ea == float(M[0, n - 1])


def test_gamma_grid_shapes_and_monotonicity():
    rng = np.random.default_rng(9)
    N = 32
    n = 24
    bpp = _random_bpp(rng, n, N)
    gammas = jnp.asarray(DEFAULT_GAMMAS, dtype=jnp.float32)
    fills = np.asarray(mea_fill_gammas(jnp.asarray(bpp), gammas, N=N))
    assert fills.shape == (len(DEFAULT_GAMMAS), N, N)
    npairs = []
    for gi, g in enumerate(DEFAULT_GAMMAS):
        from rna_algos_tpu.models.centroid import traceback

        pairs, _ = traceback(fills[gi], bpp, g, n)
        npairs.append(len(pairs))
    # larger gamma never predicts fewer pairs on the same BPP matrix
    assert all(a <= b for a, b in zip(npairs, npairs[1:]))
