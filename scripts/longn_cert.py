#!/usr/bin/env python
"""Long-n throughput certification: median + band over pinned-seed batches.

Round-4 exposed a ~2x batch-mix retry-tail band at N=1024 (BASELINE.md):
single-batch numbers are not certifiable run-to-run.  This suite measures
the chunked-tier throughput on >= 3 PINNED seed batches per (model, N)
and reports median + min/max band, so the committed number is a
distribution property instead of one draw (VERDICT round 4, item 5).

Writes bench_artifacts/longn_cert.json.

Usage: python scripts/longn_cert.py [N ...]     (default: 1024)
Env: LONGN_BATCH (default 16), LONGN_SEEDS (default "3,7,11"),
     LONGN_REPS (default 4), RNA_ALGOS_NUMERICS (default exact).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("LONGN_BATCH", "16"))
SEEDS = [int(s) for s in os.environ.get("LONGN_SEEDS", "3,7,11").split(",")]
REPS = int(os.environ.get("LONGN_REPS", "4"))


def main():
    import jax.numpy as jnp

    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch_auto
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils.trace import force, force_last

    sizes = [int(a) for a in sys.argv[1:]] or [1024]
    ct = S.contra_table_pytree(build_fold_score_sets())
    tt = S.turner_table_pytree()
    report = {"batch": B, "seeds": SEEDS, "reps": REPS, "results": {}}
    for N in sizes:
        for model, tbl, contra in (("contra", ct, True), ("turner", tt, False)):
            if N >= 2048 and not contra:
                continue  # Turner 2048 tier not opened (models/mccaskill.py)
            vals = []
            per_seed = {}
            for seed in SEEDS:
                rng = np.random.RandomState(seed)
                lens = rng.randint(int(N * 0.75), N + 1, size=B)
                batch = [
                    rng.randint(0, 4, size=int(l)).astype(np.int32)
                    for l in lens
                ]
                arr = jnp.asarray(pad_seqs(batch, N))
                ns = jnp.asarray(lens.astype(np.int32))
                out = mccaskill_bpp_batch_auto(
                    arr, ns, tbl, N=N, contra=contra
                )
                force(out)  # compile + warm (includes retry walk)
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    outs = [
                        mccaskill_bpp_batch_auto(
                            arr, ns, tbl, N=N, contra=contra
                        )
                        for _ in range(REPS)
                    ]
                    force_last(outs[-1][0])
                    best = min(best, (time.perf_counter() - t0) / REPS)
                vals.append(B / best)
                per_seed[seed] = round(B / best, 2)
                print(
                    f"# {model} N={N} seed={seed}: {B / best:.2f} seqs/s",
                    file=sys.stderr, flush=True,
                )
            vals.sort()
            med = vals[len(vals) // 2] if len(vals) % 2 else (
                0.5 * (vals[len(vals) // 2 - 1] + vals[len(vals) // 2])
            )
            entry = {
                "median_seqs_per_s": round(med, 2),
                "band": [round(vals[0], 2), round(vals[-1], 2)],
                "per_seed": per_seed,
            }
            report["results"][f"{model}_N{N}"] = entry
            print(json.dumps({f"{model}_N{N}": entry}), flush=True)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench_artifacts", "longn_cert.json",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    # merge with any prior runs (different N sizes accumulate)
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
            prev.get("results", {}).update(report["results"])
            report["results"] = prev.get("results", report["results"])
        except (OSError, ValueError):
            pass
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print("wrote", out_path, file=sys.stderr)


if __name__ == "__main__":
    main()
