"""Durbin pair-HMM parity vs the scalar oracle + reference bounds property."""

import numpy as np
import jax.numpy as jnp

from rna_algos_tpu.constants import (
    PSEUDO_BASE,
    PROB_BOUND_LOWER,
    PROB_BOUND_UPPER,
)
from rna_algos_tpu.params import build_align_scores
from rna_algos_tpu.models.durbin import durbin_match_probs, durbin_match_probs_batch
from rna_algos_tpu.utils import read_fasta

from .oracle.durbin_oracle import durbin_oracle

SC = build_align_scores()
SCJ = {k: jnp.asarray(v) for k, v in SC.items()}


def _wrap(seq):
    """PSEUDO_BASE sentinels at both ends (bin/durbin_algo.rs:49-50)."""
    return np.concatenate([[PSEUDO_BASE], seq, [PSEUDO_BASE]]).astype(np.int32)


def _pad(seq, N):
    out = np.full(N, PSEUDO_BASE, dtype=np.int32)
    out[: len(seq)] = seq
    return jnp.asarray(out)


def test_durbin_random_vs_oracle():
    rng = np.random.default_rng(3)
    N1, N2 = 32, 32
    for _ in range(5):
        n1 = int(rng.integers(5, 24))
        n2 = int(rng.integers(5, 24))
        s1 = _wrap(rng.integers(0, 4, size=n1))
        s2 = _wrap(rng.integers(0, 4, size=n2))
        got = np.asarray(
            durbin_match_probs(
                _pad(s1, N1), jnp.int32(len(s1)), _pad(s2, N2), jnp.int32(len(s2)),
                SCJ, N1=N1, N2=N2,
            )
        )
        ref = durbin_oracle(s1, s2, SC)
        err = np.abs(got[: len(s1), : len(s2)] - ref).max()
        assert err < 2e-4, err
        assert got[len(s1):, :].sum() == 0.0
        assert got[:, len(s2):].sum() == 0.0


def test_durbin_trna_pair_vs_oracle():
    recs = read_fasta("assets/sampled_trnas.fa")
    s1 = _wrap(np.asarray(recs[0].seq))
    s2 = _wrap(np.asarray(recs[1].seq))
    N = 96
    got = np.asarray(
        durbin_match_probs(
            _pad(s1, N), jnp.int32(len(s1)), _pad(s2, N), jnp.int32(len(s2)),
            SCJ, N1=N, N2=N,
        )
    )
    ref = durbin_oracle(s1, s2, SC)
    err = np.abs(got[: len(s1), : len(s2)] - ref).max()
    assert err < 5e-4, err
    # row sums of a posterior match distribution stay <= ~1
    assert got.sum(axis=1).max() < 1.0 + 1e-3


def test_durbin_all_pairs_bounds():
    """Reference bounds property over all pairs (tests/tests.rs:45-80)."""
    recs = read_fasta("assets/sampled_trnas.fa")
    N = 96
    seqs, ns = [], []
    for r in recs:
        w = _wrap(np.asarray(r.seq))
        seqs.append(_pad(w, N))
        ns.append(len(w))
    pairs = [(i, j) for i in range(len(recs)) for j in range(i + 1, len(recs))]
    s1 = jnp.stack([seqs[i] for i, _ in pairs])
    n1 = jnp.asarray([ns[i] for i, _ in pairs], dtype=jnp.int32)
    s2 = jnp.stack([seqs[j] for _, j in pairs])
    n2 = jnp.asarray([ns[j] for _, j in pairs], dtype=jnp.int32)
    probs = np.asarray(durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N))
    assert probs.shape == (len(pairs), N, N)
    assert (probs > PROB_BOUND_LOWER).all()
    assert (probs < PROB_BOUND_UPPER).all()
