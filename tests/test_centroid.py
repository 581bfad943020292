"""Centroid MEA estimator: device fill vs scalar oracle, traceback semantics."""

import numpy as np
import jax.numpy as jnp

from rna_algos_tpu.models.centroid import (
    DEFAULT_GAMMAS,
    centroid_fold,
    mea_fill,
    mea_fill_gammas,
)
from tests.oracle.centroid_oracle import mea_fill_oracle as _scalar_fill


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


def test_centroid_identity_trna_full_grid(trna_records):
    """Centroid-structure identity on the tRNA fixture across the FULL gamma
    grid (VERDICT round 1, item 8): the device fill must reproduce the
    scalar-oracle fill's float32 values cell-for-cell, and the traceback
    structures derived from either fill must match EXACTLY — the
    float-equality semantics of centroid_fold.rs:66-102."""
    from rna_algos_tpu.models.centroid import traceback
    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.constants import PSEUDO_BASE

    recs = trna_records
    N = 96
    seqs = np.full((len(recs), N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(len(recs), dtype=np.int32)
    for k, r in enumerate(recs):
        seqs[k, : len(r.seq)] = r.seq
        ns[k] = len(r.seq)
    bpps, _ = mccaskill_bpp_batch(
        jnp.asarray(seqs), jnp.asarray(ns),
        S.contra_table_pytree(build_fold_score_sets()), N=N, contra=True,
    )
    bpps = np.asarray(bpps)
    for k in range(len(recs)):
        n = int(ns[k])
        bpp = bpps[k]
        for gamma in DEFAULT_GAMMAS:
            M_dev = np.asarray(mea_fill(jnp.asarray(bpp), gamma, N=N))
            M_orc = _scalar_fill(bpp, n, gamma)
            np.testing.assert_array_equal(M_dev[:n, :n], M_orc, err_msg=f"{k} {gamma}")
            pairs_dev, ea_dev = traceback(M_dev, bpp, gamma, n)
            pairs_orc, ea_orc = traceback(
                np.ascontiguousarray(M_orc), bpp[:n, :n], gamma, n
            )
            assert sorted(pairs_dev) == sorted(pairs_orc), (k, gamma)
            assert ea_dev == ea_orc


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
