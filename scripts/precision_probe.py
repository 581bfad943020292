#!/usr/bin/env python
"""Accuracy probe for the banded-window matmul precision tiers.

The 2-loop window matmuls (ops/pallas_fold_prob._band_mm / _band_mm8) run
at a configurable MXU precision (RNA_ALGOS_BAND_PRECISION = highest /
high / default).  This script quantifies what each tier costs in BPP
accuracy, against two arbiters:

* the committed goldens (scalar cubic oracle, 5e-4 test budget) on the
  tRNA fixture via the production prob8 path (N = 128 — the headline
  configuration), and
* the float64 true-math oracle (tests/oracle.numerics_oracle.f64_mode)
  on one random n = PROBE_LEN sequence via the per-sequence resident
  path (N = 256) — the exact-tier accuracy claim in BASELINE.md.

The f64 oracle run is precision-independent and slow (scalar Python
loops), so its result is cached in /tmp keyed by (seed, len, model).

Env: RNA_ALGOS_BAND_PRECISION (what to probe), PROBE_LEN (default 245),
PROBE_MODEL=contra|turner (default contra), PROBE_SKIP_ORACLE=1.
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PROBE_LEN = int(os.environ.get("PROBE_LEN", "245"))
MODEL = os.environ.get("PROBE_MODEL", "contra")
SEED = 7


def main():
    import jax.numpy as jnp

    from rna_algos_tpu.constants import PSEUDO_BASE
    from rna_algos_tpu.models import mccaskill as M
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.utils import read_fasta

    prec = os.environ.get("RNA_ALGOS_BAND_PRECISION", "highest")
    contra = MODEL == "contra"
    fss = build_fold_score_sets()
    tbl = S.contra_table_pytree(fss) if contra else S.turner_table_pytree()

    # --- tRNA fixture vs goldens (headline prob8 path, N = 128) ---------
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = read_fasta(os.path.join(root, "assets/sampled_trnas.fa"))
    golden = np.load(os.path.join(root, "tests/golden/trna_bpps.npz"))
    B, N = 8, 128
    seqs = np.full((B, N), PSEUDO_BASE, np.int32)
    ns = np.zeros(B, np.int32)
    for k in range(B):
        r = recs[k % len(recs)]
        seqs[k, : len(r.seq)] = r.seq
        ns[k] = len(r.seq)
    bpp, _ = M.mccaskill_bpp_batch_pallas(
        jnp.asarray(seqs), jnp.asarray(ns), tbl, N=N, contra=contra
    )
    bpp = np.asarray(bpp)
    gname = "contra" if contra else "turner"
    gerr = 0.0
    for k in range(len(recs)):
        ref = golden[f"rec{k}_{gname}"]
        n = ref.shape[0]
        gerr = max(gerr, float(np.abs(bpp[k, :n, :n] - ref).max()))
    print(json.dumps({
        "probe": "trna_vs_golden", "precision": prec, "model": MODEL,
        "max_abs_diff": gerr, "budget": 5e-4, "ok": gerr < 5e-4,
    }), flush=True)

    if os.environ.get("PROBE_SKIP_ORACLE") == "1":
        return

    # --- long-n vs the f64 true-math oracle (resident path, N = 256) ---
    rng = np.random.RandomState(SEED)
    seq = rng.randint(0, 4, size=PROBE_LEN).astype(np.int32)
    cache = f"/tmp/f64_oracle_{MODEL}_{SEED}_{PROBE_LEN}.npz"
    if os.path.exists(cache):
        ref = np.load(cache)["bpp"]
    else:
        from tests.oracle import fold_oracle
        from tests.oracle import numerics_oracle as NO

        kw = {"uses_contra_model": contra}
        if contra:
            kw["fss"] = fss
        with NO.f64_mode():
            bppd, _, _ = fold_oracle.mccaskill_oracle([int(b) for b in seq], **kw)
        ref = np.zeros((PROBE_LEN, PROBE_LEN), np.float64)
        for (i, j), p in bppd.items():
            ref[i, j] = p
        np.savez_compressed(cache, bpp=ref)
    N2 = 256
    s2 = np.full((1, N2), PSEUDO_BASE, np.int32)
    s2[0, :PROBE_LEN] = seq
    bpp2, _ = M.mccaskill_bpp_batch_pallas(
        jnp.asarray(s2), jnp.asarray([PROBE_LEN], dtype=jnp.int32), tbl,
        N=N2, contra=contra,
    )
    d = float(np.abs(np.asarray(bpp2)[0, :PROBE_LEN, :PROBE_LEN] - ref).max())
    print(json.dumps({
        "probe": "f64_oracle", "precision": prec, "model": MODEL,
        "n": PROBE_LEN, "max_abs_diff": d,
    }), flush=True)


if __name__ == "__main__":
    main()
