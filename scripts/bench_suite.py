#!/usr/bin/env python
"""Criterion-equivalent benchmark suite: the reference's three benches.

Mirrors `/root/reference/benches/benches.rs`:
  * whole-batch McCaskill (Turner) on the 6 sampled tRNAs (:28-41),
  * whole-batch McCaskill (CONTRAfold) (:43-55),
  * all unordered pairs Durbin (:78-92).

Reports each as one JSON line with the reference-equivalent whole-batch wall
time plus derived throughput.  ``BENCH_SCALE`` tiles the fixture batch (the
reference bench is 6 sequences — latency-bound on a TPU; the scaled variant
shows sustained throughput).  Honors RNA_ALGOS_NUMERICS / RNA_ALGOS_BACKEND.

Usage: python scripts/bench_suite.py [reps]
"""

import itertools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
SCALE = int(os.environ.get("BENCH_SCALE", "1"))


def _time(fn, block):
    fn()  # compile + warm
    block()
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        block()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from rna_algos_tpu import numerics
    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch_auto
    from rna_algos_tpu.models.durbin import durbin_match_probs_batch_auto
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets, build_align_scores
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.constants import PSEUDO_BASE
    from rna_algos_tpu.utils import read_fasta
    from rna_algos_tpu.utils.trace import force_last

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = read_fasta(os.path.join(root, "assets/sampled_trnas.fa"))
    seqs = [r.seq for r in recs] * SCALE
    N = 128
    arr = jnp.asarray(pad_seqs(seqs, N))
    ns = jnp.asarray(np.array([len(s) for s in seqs], dtype=np.int32))
    ct = S.contra_table_pytree(build_fold_score_sets())
    tt = S.turner_table_pytree()

    env = {
        "numerics": numerics.get_mode(),
        "backend": os.environ.get("RNA_ALGOS_BACKEND", "auto"),
        "batch": len(seqs),
        "device": str(jax.devices()[0]),
    }

    out = {}
    for name, tbl, contra in (("turner", tt, False), ("contra", ct, True)):
        res = {}

        def fold():
            res["out"] = mccaskill_bpp_batch_auto(arr, ns, tbl, N=N, contra=contra)

        # forcing the BPP array alone proves the whole execution finished
        dt = _time(fold, lambda: force_last(res["out"][0]))
        out[f"mccaskill_{name}"] = dt

    # all unordered pairs, sentinel-wrapped (bin/durbin_algo.rs:44-63)
    wrapped = [
        np.concatenate(([PSEUDO_BASE], s, [PSEUDO_BASE])).astype(np.int32)
        for s in seqs
    ]
    pairs = list(itertools.combinations(range(len(wrapped)), 2))
    Nd = 128
    p1 = jnp.asarray(pad_seqs([wrapped[i] for i, _ in pairs], Nd))
    p2 = jnp.asarray(pad_seqs([wrapped[j] for _, j in pairs], Nd))
    l1 = jnp.asarray(np.array([len(wrapped[i]) for i, _ in pairs], np.int32))
    l2 = jnp.asarray(np.array([len(wrapped[j]) for _, j in pairs], np.int32))
    sc = {k: jnp.asarray(v) for k, v in build_align_scores().items()}
    res = {}

    def durbin():
        res["out"] = durbin_match_probs_batch_auto(
            p1, l1, p2, l2, sc, N1=Nd, N2=Nd
        )

    out["durbin_all_pairs"] = _time(durbin, lambda: force_last(res["out"]))

    for name, dt in out.items():
        units = len(pairs) if name.startswith("durbin") else len(seqs)
        print(
            json.dumps(
                {
                    "bench": name,
                    "batch_wall_ms": round(dt * 1e3, 3),
                    "per_unit_ms": round(dt * 1e3 / units, 4),
                    "units_per_s": round(units / dt, 1),
                    **env,
                }
            )
        )


if __name__ == "__main__":
    main()
