"""Golden BPP parity against oracle-generated fixtures (SURVEY §4, §7).

Fixtures come from tests/golden/generate.py (scalar oracle, brute-force
validated).  These run much faster than live oracle parity and pin every
(record, model) combination over the full fixture.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rna_algos_tpu.constants import PSEUDO_BASE
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.models import mccaskill as M
from rna_algos_tpu.utils import read_fasta

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "trna_bpps.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="golden fixtures not generated"
)


@pytest.mark.parametrize("model,contra,ash", [
    ("turner", False, False),
    ("contra", True, False),
    ("contra_ash", True, True),
])
def test_golden_bpps(model, contra, ash):
    recs = read_fasta("assets/sampled_trnas.fa")
    golden = np.load(GOLDEN)
    tbl = (
        S.contra_table_pytree(build_fold_score_sets())
        if contra
        else S.turner_table_pytree()
    )
    N = 96
    seqs = np.full((len(recs), N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(len(recs), dtype=np.int32)
    for k, r in enumerate(recs):
        seqs[k, : len(r.seq)] = r.seq
        ns[k] = len(r.seq)
    bpp, _ = M.mccaskill_bpp_batch(
        jnp.asarray(seqs), jnp.asarray(ns), tbl, N=N, contra=contra,
        allows_short_hairpins=ash,
    )
    bpp = np.asarray(bpp)
    for k in range(len(recs)):
        ref = golden[f"rec{k}_{model}"]
        n = ref.shape[0]
        err = np.abs(bpp[k, :n, :n] - ref).max()
        assert err < 5e-4, (k, err)
