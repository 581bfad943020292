"""Sublane-stacked (G=8) fast-mode kernels vs the per-sequence ones.

Interpret mode (backend-agnostic); the Mosaic-compiled stacked path is
pinned on hardware by tests/test_pallas_hw.py's ("contra", True, "fast")
case, which dispatches here via models.mccaskill at N <= 128.
"""

import numpy as np
import jax.numpy as jnp

from rna_algos_tpu.constants import PSEUDO_BASE
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.ops import pallas_fold_prob as PP
from rna_algos_tpu.ops import pallas_fold_prob8 as P8

CT = S.contra_table_pytree(build_fold_score_sets())


def _batch(B, N, seed):
    rng = np.random.default_rng(seed)
    seqs = np.full((B, N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(B, dtype=np.int32)
    for k in range(B):
        n = N if k == 0 else int(rng.integers(30, N - 1))
        seqs[k, :n] = rng.integers(0, 4, size=n)
        ns[k] = n
    return jnp.asarray(seqs), jnp.asarray(ns)


def test_stacked8_matches_perseq():
    N, B = 64, 2 * P8.G  # two groups, ragged lengths within each
    seqs, ns = _batch(B, N, 5)
    want, ls_w = PP.mccaskill_contra_pallas_prob(
        seqs, ns, CT, N=N, interpret=True
    )
    got, ls_g = P8.mccaskill_contra_pallas_prob8(
        seqs, ns, CT, N=N, interpret=True
    )
    assert np.array_equal(np.asarray(ls_w), np.asarray(ls_g))
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    # identical recurrences; only the strided tree-sum reassociation differs
    assert err < 1e-4, err


def test_turner_stacked8_matches_perseq():
    TT = S.turner_table_pytree()
    N, B = 64, 2 * P8.G
    seqs, ns = _batch(B, N, 5)
    want, ls_w = PP.mccaskill_turner_pallas_prob(
        seqs, ns, TT, N=N, interpret=True
    )
    got, ls_g = P8.mccaskill_turner_pallas_prob8(
        seqs, ns, TT, N=N, interpret=True
    )
    assert np.array_equal(np.asarray(ls_w), np.asarray(ls_g))
    err = np.abs(np.asarray(got) - np.asarray(want)).max()
    assert err < 1e-4, err


def test_stacked8_interleave_roundtrip():
    Gv = P8.G
    x = jnp.arange(2 * Gv * 5 * 3, dtype=jnp.float32).reshape(2 * Gv, 5, 3)
    y = P8.ilv(x)
    assert y.shape == (2, 5 * Gv, 3)
    # row t of seq k*G+g lands at [k, t*G+g]
    assert np.array_equal(
        np.asarray(y[1, 2 * Gv + 3]), np.asarray(x[Gv + 3, 2])
    )
    assert np.array_equal(np.asarray(P8.dilv(y)), np.asarray(x))


def test_stacked8_dispatch_pads_ragged_batch():
    from rna_algos_tpu.models import mccaskill as M
    from rna_algos_tpu import numerics

    N, B = 64, 11  # not a multiple of G: dispatch must pad and slice
    seqs, ns = _batch(B, N, 9)
    pad = (-B) % P8.G
    want, _ = M.mccaskill_bpp_batch(seqs, ns, CT, N=N, contra=True)
    bppo, _ = P8.mccaskill_contra_pallas_prob8(
        jnp.concatenate([seqs, jnp.tile(seqs[:1], (pad, 1))], axis=0),
        jnp.concatenate([ns, jnp.tile(ns[:1], (pad,))]),
        CT, N=N, interpret=True,
    )
    got = np.asarray(M._prob_finish(bppo[:B], ns, N=N)[0])
    want = np.asarray(want)
    assert np.abs(got - want).max() < 5e-4


def test_dup2_and_wcols8_layouts():
    """Host-side layout helpers for the paired-history/decomposed kernels."""
    import numpy as np
    import jax.numpy as jnp

    from rna_algos_tpu.ops import pallas_fold_prob8 as P8

    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.random((2, 3 * P8.G, 5), dtype=np.float32))
    d = np.asarray(P8.dup2(y))
    assert d.shape == (2, 6 * P8.G, 5)
    yn = np.asarray(y)
    for t in range(3):
        for fam in range(2):
            np.testing.assert_array_equal(
                d[:, (t * 2 + fam) * P8.G:(t * 2 + fam + 1) * P8.G],
                yn[:, t * P8.G:(t + 1) * P8.G],
            )

    KB = jnp.asarray(rng.random((P8.G, 32, 32), dtype=np.float32))
    K2 = jnp.asarray(rng.random((P8.G, 32, 32), dtype=np.float32))
    w = np.asarray(P8._wcols8(KB, K2))
    assert w.shape == (1, 4 * 32 * P8.G, 8)
    KBn, K2n = np.asarray(KB), np.asarray(K2)
    for g in range(P8.G):
        for r in range(32):
            assert w[0, r * P8.G + g, 0] == KBn[g, 0, r]          # kb col
            assert w[0, 2 * 32 * P8.G + r * P8.G + g, 0] == K2n[g, 1, r]
        for a in range(31):
            assert w[0, 32 * P8.G + a * P8.G + g, 0] == KBn[g, a, a + 1]
        for a in range(30):
            assert w[0, 3 * 32 * P8.G + a * P8.G + g, 0] == K2n[g, a, a + 2]
