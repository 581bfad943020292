"""Fused-kernel path vs oracle goldens on real hardware (TPU only).

test_pallas.py validates the kernels in interpret mode; this pins the actual
Mosaic-compiled production path (the one the CLI/bench dispatch to) against
the brute-force-validated golden BPPs.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rna_algos_tpu.constants import PSEUDO_BASE
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.models import mccaskill as M
from rna_algos_tpu.utils import read_fasta

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "trna_bpps.npz")

from tests.conftest import tpu_required_skip

_skip = tpu_required_skip()
pytestmark = [
    pytest.mark.skipif(
        not os.path.exists(GOLDEN), reason="golden fixtures not generated"
    ),
    pytest.mark.skipif(_skip is not None, reason=_skip or ""),
]


@pytest.mark.parametrize(
    "model,contra,mode",
    [
        ("turner", False, "parity"),  # reference-cubic log-space kernels
        ("contra", True, "parity"),   # reference-cubic log-space kernels
        ("turner", False, "exact"),   # default: scaled probability-space
        ("contra", True, "exact"),    # default: scaled probability-space
        ("contra", True, "fast"),     # scaled probability-space kernels
        ("turner", False, "fast"),    # scaled probability-space kernels
    ],
)
def test_pallas_hw_golden_bpps(model, contra, mode):
    from rna_algos_tpu import numerics

    recs = read_fasta("assets/sampled_trnas.fa")
    golden = np.load(GOLDEN)
    tbl = (
        S.contra_table_pytree(build_fold_score_sets())
        if contra
        else S.turner_table_pytree()
    )
    N = 128  # fused-kernel bucket for the 68-89nt fixture
    seqs = np.full((len(recs), N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(len(recs), dtype=np.int32)
    for k, r in enumerate(recs):
        seqs[k, : len(r.seq)] = r.seq
        ns[k] = len(r.seq)
    with numerics.force_mode(mode):
        bpp, presence = M.mccaskill_bpp_batch_pallas(
            jnp.asarray(seqs), jnp.asarray(ns), tbl, N=N, contra=contra
        )
    bpp = np.asarray(bpp)
    for k in range(len(recs)):
        ref = golden[f"rec{k}_{model}"]
        n = ref.shape[0]
        err = np.abs(bpp[k, :n, :n] - ref).max()
        assert err < 5e-4, (k, err)
    assert np.asarray(presence).any()


def test_batch_memos_equal_across_backends():
    """VERDICT round 2, item 6: the batch API returns the FoldScores memo
    contract on every backend, and the memo grids are identical between the
    XLA scan and the fused Pallas path."""
    from rna_algos_tpu import numerics

    recs = read_fasta("assets/sampled_trnas.fa")
    tbl = S.contra_table_pytree(build_fold_score_sets())
    N = 128
    seqs = np.full((len(recs), N), PSEUDO_BASE, dtype=np.int32)
    ns = np.zeros(len(recs), dtype=np.int32)
    for k, r in enumerate(recs):
        seqs[k, : len(r.seq)] = r.seq
        ns[k] = len(r.seq)
    seqs, ns = jnp.asarray(seqs), jnp.asarray(ns)
    with numerics.force_mode("exact"):
        bpp_p, memos_p = M.mccaskill_bpp_batch_pallas(
            seqs, ns, tbl, N=N, contra=True, return_memos=True
        )
        bpp_x, memos_x = M.mccaskill_bpp_batch(
            seqs, ns, tbl, N=N, contra=True, return_memos=True
        )
    assert set(memos_p) == {
        "hairpin", "multibranch_close", "accessible", "presence"
    }
    for key in ("hairpin", "multibranch_close", "accessible"):
        np.testing.assert_array_equal(
            np.asarray(memos_p[key]), np.asarray(memos_x[key]), err_msg=key
        )
    # the two backends' BPPs agree within the golden budget
    assert np.abs(np.asarray(bpp_p) - np.asarray(bpp_x)).max() < 5e-4


@pytest.mark.slow
def test_band_precision_high_golden():
    """RNA_ALGOS_BAND_PRECISION=high (3-pass bf16 residual matmuls) must
    hold the same 5e-4 golden budget as the default 'highest' tier.

    The env var is read at rna_algos_tpu import (baked into every compiled
    program), so the check runs in a subprocess.
    """
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(
        """
        import os
        os.environ["RNA_ALGOS_BAND_PRECISION"] = "high"
        import numpy as np
        import jax.numpy as jnp
        from rna_algos_tpu.constants import PSEUDO_BASE
        from rna_algos_tpu.params import build_fold_score_sets
        from rna_algos_tpu.ops import scores as S
        from rna_algos_tpu.models import mccaskill as M
        from rna_algos_tpu.utils import read_fasta
        from rna_algos_tpu import numerics

        recs = read_fasta("assets/sampled_trnas.fa")
        golden = np.load("tests/golden/trna_bpps.npz")
        tbl = S.contra_table_pytree(build_fold_score_sets())
        N = 128
        seqs = np.full((len(recs), N), PSEUDO_BASE, dtype=np.int32)
        ns = np.zeros(len(recs), dtype=np.int32)
        for k, r in enumerate(recs):
            seqs[k, : len(r.seq)] = r.seq
            ns[k] = len(r.seq)
        with numerics.force_mode("exact"):
            bpp, _ = M.mccaskill_bpp_batch_pallas(
                jnp.asarray(seqs), jnp.asarray(ns), tbl, N=N, contra=True
            )
        bpp = np.asarray(bpp)
        for k in range(len(recs)):
            ref = golden[f"rec{k}_contra"]
            n = ref.shape[0]
            err = np.abs(bpp[k, :n, :n] - ref).max()
            assert err < 5e-4, (k, err)
        print("BAND_PRECISION_HIGH_OK")
        """
    )
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    out = subprocess.run(
        [sys.executable, "-c", script],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert "BAND_PRECISION_HIGH_OK" in out.stdout, (out.stdout, out.stderr)
