"""Headline benchmark: sustained McCaskill BPP throughput on tRNA-scale batches.

Criterion-equivalent of `/root/reference/benches/benches.rs:28-55` (whole-batch
McCaskill wall time on the 6 sampled tRNAs), scaled to a TPU-sized batch: the
6 tRNAs are tiled to a large padded batch, the CONTRAfold model runs the full
inside+outside wavefront per sequence, and we report sequences/second.

The reference publishes no numbers (BASELINE.md): ``REFERENCE_EST_SEQS_PER_S``
is an explicit single-host Rust estimate (multi-threaded, ~5-10 ms/seq at
~80 nt) used for ``vs_baseline`` until a cargo toolchain can measure the real
reference; the raw value is the durable metric.

Numerics: the bench measures the PRODUCTION serving configuration — the
scaled probability-space kernels (``RNA_ALGOS_NUMERICS=fast``,
ops/pallas_fold_prob.py), whose BPPs sit ~1e-4 from the reference-parity
cubics (hardware exp is *more* accurate than the reference's piecewise-cubic
approximations; "exact" trades speed for bit-faithfulness to them).  The
library default stays ``exact`` (~1.7k seqs/s at the same shapes — see
BASELINE.md) and the golden/parity test suite pins both modes.  Set
``BENCH_NUMERICS=exact`` to bench the parity mode instead.

Timing: ``jax.block_until_ready`` does NOT wait on the tunneled remote
device (utils/trace.force docstring) — every sync here fetches a scalar
that data-depends on the output buffer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# Production serving numerics (see module docstring); BENCH_NUMERICS=exact
# benches the reference-parity cubic mode.
os.environ["RNA_ALGOS_NUMERICS"] = os.environ.get("BENCH_NUMERICS", "fast")

REFERENCE_EST_SEQS_PER_S = 800.0  # est. Rust reference, 1 host / all cores
BATCH = int(os.environ.get("BENCH_BATCH", "192"))
REPS = int(os.environ.get("BENCH_REPS", "20"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch_auto as mccaskill_bpp_batch
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel.runner import pad_seqs, pick_bucket
    from rna_algos_tpu.utils import read_fasta

    recs = read_fasta(os.path.join(os.path.dirname(__file__), "assets/sampled_trnas.fa"))
    seqs = [r.seq for r in recs]
    reps = (BATCH + len(seqs) - 1) // len(seqs)
    batch = (seqs * reps)[:BATCH]
    from rna_algos_tpu.models.mccaskill import pallas_available

    N = pick_bucket(max(len(s) for s in batch))
    if N == 96 and pallas_available(True, 128):
        N = 128  # fused-kernel buckets are power-of-two
    arr = jnp.asarray(pad_seqs(batch, N))
    ns = jnp.asarray(np.array([len(s) for s in batch], dtype=np.int32))
    tbl = S.contra_table_pytree(build_fold_score_sets())

    from rna_algos_tpu.utils.trace import force, force_last

    # compile + warm (force(): block_until_ready does not actually wait on
    # tunneled remote devices — see utils/trace.force)
    out = mccaskill_bpp_batch(arr, ns, tbl, N=N, contra=True)
    force(out)

    # sustained throughput: enqueue all reps (dispatch latency overlaps
    # device compute exactly as a production serving loop would), then sync
    # once at the end of the pipeline.  Criterion-style min over trials
    # rejects contention jitter on the shared device link.
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        outs = [
            mccaskill_bpp_batch(arr, ns, tbl, N=N, contra=True)
            for _ in range(REPS)
        ]
        # single end-of-pipeline fetch: the device executes in dispatch
        # order and all outputs of a call become ready together, so one
        # element of the last rep's BPPs proves every rep finished --
        # and only one ~30 ms link round-trip lands inside the clock
        force_last(outs[-1][0])
        times.append((time.perf_counter() - t0) / REPS)
    dt = min(times)
    seqs_per_s = BATCH / dt
    print(
        json.dumps(
            {
                "metric": "mccaskill_contra_trna_batch_throughput",
                "value": round(seqs_per_s, 2),
                "unit": "seqs/s",
                "vs_baseline": round(seqs_per_s / REFERENCE_EST_SEQS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
