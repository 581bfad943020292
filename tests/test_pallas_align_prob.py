"""Scaled probability-space pair-HMM kernels (fast mode) vs the exact scan.

Interpret-mode parity (backend-agnostic); the Mosaic-compiled path is pinned
on hardware by test_prob_pallas_hw_trna_all_pairs below.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rna_algos_tpu.constants import PSEUDO_BASE
from rna_algos_tpu.params import build_align_scores
from rna_algos_tpu.models.durbin import durbin_match_probs_batch
from rna_algos_tpu.ops.pallas_align_prob import (
    durbin_match_probs_batch_pallas_prob,
)
from rna_algos_tpu.parallel.runner import pad_seqs
from rna_algos_tpu.utils import read_fasta

SCJ = {k: jnp.asarray(v) for k, v in build_align_scores().items()}


def _random_pairs(rng, P, N, lo=5, hi=28):
    s1 = np.full((P, N), PSEUDO_BASE, np.int32)
    s2 = np.full((P, N), PSEUDO_BASE, np.int32)
    n1 = np.zeros(P, np.int32)
    n2 = np.zeros(P, np.int32)
    for p in range(P):
        a = int(rng.integers(lo, hi))
        b = int(rng.integers(lo, hi))
        s1[p, 1:a + 1] = rng.integers(0, 4, a)
        s2[p, 1:b + 1] = rng.integers(0, 4, b)
        n1[p] = a + 2
        n2[p] = b + 2
    return (
        jnp.asarray(s1), jnp.asarray(n1), jnp.asarray(s2), jnp.asarray(n2)
    )


def test_prob_interpret_parity_random():
    rng = np.random.default_rng(7)
    N = 32
    s1, n1, s2, n2 = _random_pairs(rng, 5, N)
    ref = np.asarray(
        durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N)
    )
    got = np.asarray(
        durbin_match_probs_batch_pallas_prob(
            s1, n1, s2, n2, SCJ, N=N, interpret=True
        )
    )
    assert np.abs(got - ref).max() < 5e-4
    # reference bounds property (tests/tests.rs:45-80)
    assert (got >= -1e-3).all() and (got < 1.001).all()


def test_prob_interpret_parity_trna_pairs():
    # real sequences at full bucket occupancy, including identical pairs
    # (the highest per-step growth the fixture can produce)
    recs = read_fasta("assets/sampled_trnas.fa")
    wrapped = [
        np.concatenate(([PSEUDO_BASE], r.seq, [PSEUDO_BASE])).astype(np.int32)
        for r in recs
    ]
    pairs = list(itertools.combinations_with_replacement(range(3), 2))
    N = 128
    s1 = jnp.asarray(pad_seqs([wrapped[i] for i, _ in pairs], N))
    s2 = jnp.asarray(pad_seqs([wrapped[j] for _, j in pairs], N))
    n1 = jnp.asarray(np.array([len(wrapped[i]) for i, _ in pairs], np.int32))
    n2 = jnp.asarray(np.array([len(wrapped[j]) for _, j in pairs], np.int32))
    ref = np.asarray(
        durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N)
    )
    got = np.asarray(
        durbin_match_probs_batch_pallas_prob(
            s1, n1, s2, n2, SCJ, N=N, interpret=True
        )
    )
    assert np.abs(got - ref).max() < 5e-4


@pytest.mark.skipif(
    __import__("tests.conftest", fromlist=["x"]).tpu_required_skip()
    is not None,
    reason="Mosaic path needs a TPU (or CPU-forced run)",
)
def test_prob_pallas_hw_trna_all_pairs():
    recs = read_fasta("assets/sampled_trnas.fa")
    wrapped = [
        np.concatenate(([PSEUDO_BASE], r.seq, [PSEUDO_BASE])).astype(np.int32)
        for r in recs
    ]
    pairs = list(itertools.combinations(range(len(wrapped)), 2))
    N = 128
    s1 = jnp.asarray(pad_seqs([wrapped[i] for i, _ in pairs], N))
    s2 = jnp.asarray(pad_seqs([wrapped[j] for _, j in pairs], N))
    n1 = jnp.asarray(np.array([len(wrapped[i]) for i, _ in pairs], np.int32))
    n2 = jnp.asarray(np.array([len(wrapped[j]) for _, j in pairs], np.int32))
    got = np.asarray(
        durbin_match_probs_batch_pallas_prob(s1, n1, s2, n2, SCJ, N=N)
    )
    ref = np.asarray(
        durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N)
    )
    assert np.abs(got - ref).max() < 5e-4
    # reference bounds property (tests/tests.rs:45-80)
    assert (got >= -1e-3).all() and (got < 1.001).all()
