#!/usr/bin/env python
"""Long-sequence benchmark: the XLA-scan fallback beyond the fused-kernel cap.

Measures the auto-dispatched long-sequence path (reference u16 index
supports 65,535 nt, utils.rs:24-43).  256 < n <= 512 rides the span-chunked
fused prob kernels (ops/pallas_fold_prob.py) in the exact/fast tiers;
N >= 1024 (and the parity tier) falls back to the XLA wavefront scan —
force it with RNA_ALGOS_BACKEND=xla to measure the crossover
(VERDICT round 1, item 7; numbers in BASELINE.md).

Usage: python scripts/longseq_bench.py [N ...]   (default: 512 1024)
Env: LONGSEQ_BATCH (default 16), LONGSEQ_REPS (default 3),
     RNA_ALGOS_NUMERICS (default exact).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("LONGSEQ_BATCH", "16"))
REPS = int(os.environ.get("LONGSEQ_REPS", "3"))


def main():
    import jax.numpy as jnp

    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch_auto
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils.trace import force, force_last

    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024]
    tbl = S.contra_table_pytree(build_fold_score_sets())
    rng = np.random.RandomState(3)
    for N in sizes:
        lens = rng.randint(int(N * 0.75), N + 1, size=B)
        batch = [rng.randint(0, 4, size=int(l)).astype(np.int32) for l in lens]
        arr = jnp.asarray(pad_seqs(batch, N))
        ns = jnp.asarray(lens.astype(np.int32))
        t0 = time.perf_counter()
        out = mccaskill_bpp_batch_auto(arr, ns, tbl, N=N, contra=True)
        force(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [
                mccaskill_bpp_batch_auto(arr, ns, tbl, N=N, contra=True)
                for _ in range(REPS)
            ]
            force_last(outs[-1][0])
            times.append((time.perf_counter() - t0) / REPS)
        dt = min(times)
        print(json.dumps({
            "metric": "longseq", "backend": os.environ.get("RNA_ALGOS_BACKEND", "auto"),
            "N": N, "batch": B,
            "numerics": os.environ.get("RNA_ALGOS_NUMERICS", "exact"),
            "seqs_per_s": round(B / dt, 2),
            "ms_per_seq": round(dt / B * 1e3, 2),
            "first_call_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
