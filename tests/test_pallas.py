"""Fused Pallas kernels vs the XLA scan (interpret mode; backend-agnostic)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rna_algos_tpu.constants import PSEUDO_BASE
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.ops import pallas_fold as PF
from rna_algos_tpu.models import mccaskill as M
from rna_algos_tpu.numerics import expf

CT = S.contra_table_pytree(build_fold_score_sets())


def _batch(rng, B, N, nmin=30):
    seqs = np.full((B, N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(B, dtype=np.int32)
    for k in range(B):
        # k == 0 pins the n == N edge (full-range dynamic span loop)
        n = N if k == 0 else int(rng.integers(nmin, N - 1))
        seqs[k, :n] = rng.integers(0, 4, size=n)
        ns[k] = n
    return jnp.asarray(seqs), jnp.asarray(ns)


def test_pallas_contra_bpp_matches_xla():
    rng = np.random.default_rng(5)
    N, B = 64, 2
    seqs, ns = _batch(rng, B, N)
    bppo, _, _, _ = PF.mccaskill_contra_pallas(seqs, ns, CT, N=N, interpret=True)
    got = np.asarray(expf(jnp.swapaxes(bppo, 1, 2)))  # [i, d]
    want, _ = M.mccaskill_bpp_batch(seqs, ns, CT, N=N, contra=True)
    want = np.asarray(want)
    for k in range(B):
        n = int(ns[k])
        sq = np.zeros((N, N), dtype=np.float32)
        for d in range(N):
            ii = np.arange(N - d)
            sq[ii, ii + d] = got[k, ii, d]
        err = np.abs(sq[:n, :n] - want[k, :n, :n]).max()
        assert err < 2e-4, (k, err)


def test_pallas_square_conversion_matches_xla():
    rng = np.random.default_rng(6)
    N, B = 64, 2
    seqs, ns = _batch(rng, B, N)
    bppo, _, _, _ = PF.mccaskill_contra_pallas(seqs, ns, CT, N=N, interpret=True)
    bppo_left = jnp.swapaxes(bppo, 1, 2)
    want_bpp, _ = M.mccaskill_bpp_batch(seqs, ns, CT, N=N, contra=True)
    for k in range(int(seqs.shape[0])):
        n = int(ns[k])
        bpp = np.asarray(M._square_from_left(expf(bppo_left[k]), ns[k], N, 0.0))
        np.testing.assert_allclose(
            bpp[:n, :n], np.asarray(want_bpp)[k, :n, :n], atol=2e-4
        )


def test_skew_pq_batch_matches_diag_skew():
    """ops.pallas_skew must be a bitwise-identical diagonal re-layout."""
    from rna_algos_tpu.ops import diag
    from rna_algos_tpu.ops.pallas_skew import skew_pq_batch

    rng = np.random.default_rng(9)
    B, N, T = 3, 64, 4
    mats = [
        jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
        for _ in range(T)
    ]
    outs = skew_pq_batch(mats, interpret=True)
    for m, o in zip(mats, outs):
        want = np.asarray(jax.vmap(lambda x: diag.skew_pq(x, 0.0))(m))
        assert np.array_equal(np.asarray(o), want)


def test_unskew_pq_batch_matches_diag_unskew():
    """inv=True (the [i, d] -> square BPP conversion) is the exact inverse
    permutation with zero fill below the diagonal (round 5)."""
    from rna_algos_tpu.ops import diag
    from rna_algos_tpu.ops.pallas_skew import skew_pq_batch

    rng = np.random.default_rng(10)
    B, N = 3, 64
    m = jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32))
    (o,) = skew_pq_batch([m], interpret=True, inv=True)
    want = np.asarray(jax.vmap(lambda x: diag.unskew_pq(x, 0.0))(m))
    assert np.array_equal(np.asarray(o), want)
    # and it inverts the forward skew on the upper triangle
    (fwd,) = skew_pq_batch([m], interpret=True)
    (round_trip,) = skew_pq_batch([fwd], interpret=True, inv=True)
    i = np.arange(N)[:, None]
    j = np.arange(N)[None, :]
    upper = (j >= i)[None]
    assert np.array_equal(
        np.where(upper, np.asarray(round_trip), 0.0),
        np.where(upper, np.asarray(m), 0.0),
    )
