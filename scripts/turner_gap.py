#!/usr/bin/env python
"""Measure the Turner-vs-CONTRA fused-kernel throughput gap (tRNA N=128).

VERDICT round 1, item 10: Turner fast-mode trailed CONTRA (3,835 vs 6,310
seqs/s with the per-sequence prob kernels).  This script times both models
through the SAME dispatch bench.py uses (prob8 sublane-stacked kernels at
N=128) plus the stage split of the Turner prob8 body, so the gap can be
attributed (precompute vs kernels) and tracked.

Env: GAP_BATCH (default 192), RNA_ALGOS_NUMERICS (default exact).
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("GAP_BATCH", "192"))
N = 128


def _time(fn, force_last, reps=20, trials=8):
    out = fn()
    force_last(out)
    times = []
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        force_last(outs[-1])
        times.append((time.perf_counter() - t0) / reps)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp

    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch_auto
    from rna_algos_tpu.ops import pallas_fold_prob8 as P8
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils import read_fasta
    from rna_algos_tpu.utils.trace import force_last

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = read_fasta(os.path.join(root, "assets/sampled_trnas.fa"))
    seqs = [r.seq for r in recs]
    batch = (seqs * ((B + len(seqs) - 1) // len(seqs)))[:B]
    arr = jnp.asarray(pad_seqs(batch, N))
    ns = jnp.asarray(np.array([len(s) for s in batch], dtype=np.int32))

    tt = S.turner_table_pytree()
    ct = S.contra_table_pytree(build_fold_score_sets())

    for model, tbl, contra in (("contra", ct, True), ("turner", tt, False)):
        dt = _time(
            lambda: mccaskill_bpp_batch_auto(arr, ns, tbl, N=N, contra=contra)[0],
            force_last,
        )
        print(json.dumps({
            "metric": "model_gap", "model": model, "batch": B, "N": N,
            "numerics": os.environ.get("RNA_ALGOS_NUMERICS", "exact"),
            "seqs_per_s": round(B / dt, 1),
            "ms_per_batch": round(dt * 1e3, 2),
        }), flush=True)

    # Turner prob8 stage split at a fixed converged ln_sigma (no retries).
    full = partial(P8.mccaskill_turner_pallas_prob8, arr, ns, tt, N=N)
    _bppo, ls = full()
    ls = jnp.asarray(jax.device_get(ls))

    @jax.jit
    def pmats_only(ls):
        from rna_algos_tpu.ops import pallas_fold_prob as PP

        return PP.turner_prob_mats(arr, ns, tt, ls, N)

    @jax.jit
    def body(ls):
        return P8._turner_prob8_run_body(arr, ns, tt, ls, N, False)

    t_pm = _time(lambda: pmats_only(ls), force_last)
    t_body = _time(lambda: body(ls)[0], force_last)
    t_full = _time(lambda: full()[0], force_last)
    for k, v in (
        ("turner_pmats", t_pm),
        ("turner_body", t_body),
        ("turner_full", t_full),
        ("turner_kernels+aux", t_body - t_pm),
        ("turner_retry_oh", t_full - t_body),
    ):
        print(json.dumps({
            "phase": k, "batch_ms": round(v * 1e3, 2),
            "per_seq_us": round(v * 1e6 / B, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
