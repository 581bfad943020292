"""Fused pair-HMM kernel (ops/pallas_align.py) parity tests.

Interpret-mode parity vs the XLA row-scan model (itself oracle-validated in
test_durbin.py); the Mosaic-compiled path is pinned on hardware in
test_pallas_hw.py-style gating below.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rna_algos_tpu.constants import PSEUDO_BASE
from rna_algos_tpu.params import build_align_scores
from rna_algos_tpu.models.durbin import (
    durbin_match_probs_batch,
    durbin_match_probs_batch_auto,
)
from rna_algos_tpu.ops.pallas_align import durbin_match_probs_batch_pallas
from rna_algos_tpu.parallel.runner import pad_seqs
from rna_algos_tpu.utils import read_fasta

SC = build_align_scores()
SCJ = {k: jnp.asarray(v) for k, v in SC.items()}


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


def test_interpret_parity_random():
    rng = np.random.default_rng(3)
    N = 32
    s1, n1, s2, n2 = _random_pairs(rng, 5, N)
    ref = np.asarray(
        durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N)
    )
    got = np.asarray(
        durbin_match_probs_batch_pallas(
            s1, n1, s2, n2, SCJ, N=N, interpret=True
        )
    )
    assert np.abs(got - ref).max() < 2e-4


def test_auto_dispatch_xla_fallback():
    # non-square buckets fall back to the row scan
    rng = np.random.default_rng(4)
    N = 32
    s1, n1, s2, n2 = _random_pairs(rng, 3, N)
    a = durbin_match_probs_batch_auto(s1, n1, s2, n2, SCJ, N1=N, N2=N,
                                      backend="xla")
    b = durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N)
    assert np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(
    __import__("tests.conftest", fromlist=["x"]).tpu_required_skip()
    is not None,
    reason="Mosaic path needs a TPU (or CPU-forced run)",
)
def test_pallas_hw_trna_all_pairs():
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
        durbin_match_probs_batch_pallas(s1, n1, s2, n2, SCJ, N=N)
    )
    ref = np.asarray(
        durbin_match_probs_batch(s1, n1, s2, n2, SCJ, N1=N, N2=N)
    )
    assert np.abs(got - ref).max() < 2e-4
    # reference bounds property (tests/tests.rs:45-80)
    assert (got >= -1e-3).all() and (got < 1.001).all()
