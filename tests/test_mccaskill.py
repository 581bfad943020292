"""Parity + property tests of the vectorized McCaskill against the NumPy oracle.

The oracle (tests/oracle/fold_oracle.py) re-derives the reference recurrences
(`/root/reference/src/mccaskill_algo.rs:282-723`) scalar-by-scalar in streaming
order and is itself validated against brute-force ensemble enumeration
(tests/test_oracle.py).  Here we pin the production wavefront implementation to
it, and keep the reference's probability-bound property test
(`/root/reference/tests/tests.rs:7-43`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rna_algos_tpu.constants import (
    PSEUDO_BASE,
    PROB_BOUND_LOWER,
    PROB_BOUND_UPPER,
)
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.models import mccaskill as M
from rna_algos_tpu.utils import read_fasta

from .oracle.fold_oracle import mccaskill_oracle

FSS = build_fold_score_sets()
CT = S.contra_table_pytree(FSS)
TT = S.turner_table_pytree()


def _pad(seq, N):
    out = np.full(N, PSEUDO_BASE, dtype=np.int32)
    out[: len(seq)] = seq
    return jnp.asarray(out)


def _oracle_mat(seq, N, contra, ash=False):
    obpp, _, _ = mccaskill_oracle(
        seq, uses_contra_model=contra, allows_short_hairpins=ash, fss=FSS
    )
    ref = np.zeros((N, N), dtype=np.float32)
    for (i, j), p in obpp.items():
        ref[i, j] = p
    return ref


@pytest.mark.parametrize("contra", [False, True])
def test_mccaskill_random_vs_oracle(contra):
    rng = np.random.default_rng(7)
    N = 32
    for _ in range(4):
        n = int(rng.integers(8, 22))
        seq = rng.integers(0, 4, size=n).astype(np.int32)
        bpp, _ = M.mccaskill_bpp(_pad(seq, N), jnp.int32(n), CT if contra else TT,
                                 N=N, contra=contra)
        err = np.abs(np.asarray(bpp) - _oracle_mat(seq, N, contra)).max()
        assert err < 2e-4, err


@pytest.mark.parametrize("contra,ash", [(False, False), (True, False), (True, True)])
def test_mccaskill_trna_vs_oracle(contra, ash):
    rec = read_fasta("assets/sampled_trnas.fa")[1]
    seq = np.asarray(rec.seq, dtype=np.int32)
    N = 96
    bpp, _ = M.mccaskill_bpp(
        _pad(seq, N), jnp.int32(len(seq)), CT if contra else TT,
        N=N, contra=contra, allows_short_hairpins=ash,
    )
    err = np.abs(np.asarray(bpp) - _oracle_mat(seq, N, contra, ash)).max()
    assert err < 5e-4, err


def test_mccaskill_batch_prob_bounds():
    """Reference bounds property (tests/tests.rs:33,38) over the whole fixture."""
    recs = read_fasta("assets/sampled_trnas.fa")
    N = 96
    seqs = jnp.stack([_pad(np.asarray(r.seq), N) for r in recs])
    ns = jnp.asarray([len(r.seq) for r in recs], dtype=jnp.int32)
    for contra, tbl in ((False, TT), (True, CT)):
        bpp, _ = M.mccaskill_bpp_batch(seqs, ns, tbl, N=N, contra=contra)
        bpp = np.asarray(bpp)
        assert bpp.shape == (len(recs), N, N)
        assert (bpp > PROB_BOUND_LOWER).all()
        assert (bpp < PROB_BOUND_UPPER).all()
        # padded area stays exactly zero
        for k, r in enumerate(recs):
            assert bpp[k, len(r.seq):, :].sum() == 0.0
            assert bpp[k, :, len(r.seq):].sum() == 0.0


def test_mccaskill_batch_matches_single():
    recs = read_fasta("assets/sampled_trnas.fa")[:3]
    N = 96
    seqs = jnp.stack([_pad(np.asarray(r.seq), N) for r in recs])
    ns = jnp.asarray([len(r.seq) for r in recs], dtype=jnp.int32)
    batch, _ = M.mccaskill_bpp_batch(seqs, ns, CT, N=N, contra=True)
    batch = np.asarray(batch)
    for k in range(3):
        single, _ = M.mccaskill_bpp(seqs[k], ns[k], CT, N=N, contra=True)
        np.testing.assert_allclose(batch[k], np.asarray(single), atol=1e-6)


@pytest.mark.parametrize("contra", [False, True])
def test_twoloop_memo(contra):
    """The on-demand twoloop_scores memo (VERDICT round 3, item 5) matches
    the oracle's per-(i, j, k, l) 2-loop scores exactly on every key the
    reference would memoize, and is NEG_INF outside the valid window."""
    rng = np.random.default_rng(13)
    N = 32
    n = 28
    seq = rng.integers(0, 4, size=n).astype(np.int32)
    _, scores, _ = mccaskill_oracle(seq, uses_contra_model=contra, fss=FSS)
    TL = np.asarray(
        M.mccaskill_twoloop_memo(
            _pad(seq, N), jnp.int32(n), CT if contra else TT, N=N,
            contra=contra,
        )
    )
    assert TL.shape == (N, N, 31, 31)
    assert scores["twoloop"], "oracle produced no twoloop entries"
    for (i, j, k, l), v in scores["twoloop"].items():
        d, a, b = j - i, k - i - 1, j - l - 1
        got = TL[d, i, a, b]
        assert abs(got - float(v)) < 1e-5, ((i, j, k, l), got, float(v))
    # outside the window: inner span < 1 or loop len > 30 or j >= n
    assert TL[5, 0, 4, 4] == -np.inf      # a+b > d-3
    assert TL[10, n - 5, 1, 1] == -np.inf  # j >= n


def test_batch_return_memos_contract():
    """return_memos=True yields the batched FoldScores grids on the XLA
    path and they match the single-sequence memos (left layout [i, d])."""
    import jax.numpy as jnp
    import numpy as np

    from rna_algos_tpu.constants import PSEUDO_BASE
    from rna_algos_tpu.models import mccaskill as M
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets

    rng = np.random.default_rng(9)
    N, B = 32, 3
    seqs = np.full((B, N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(B, dtype=np.int32)
    for k in range(B):
        n = int(rng.integers(20, N - 1))
        seqs[k, :n] = rng.integers(0, 4, size=n)
        ns[k] = n
    tbl = S.contra_table_pytree(build_fold_score_sets())
    bpp, memos = M.mccaskill_bpp_batch(
        jnp.asarray(seqs), jnp.asarray(ns), tbl, N=N, contra=True,
        return_memos=True,
    )
    assert set(memos) == {
        "hairpin", "multibranch_close", "accessible", "presence"
    }
    for k in range(B):
        _bpp1, m1 = M.mccaskill_bpp(
            jnp.asarray(seqs[k]), jnp.asarray(ns[k]), tbl, N=N, contra=True
        )
        for key in ("hairpin", "multibranch_close", "accessible"):
            np.testing.assert_array_equal(
                np.asarray(memos[key])[k], np.asarray(m1[key]), err_msg=key
            )
