#!/usr/bin/env python
"""Stacked-kernel A/B bench at the tRNA headline shape (round 4).

Measures the prob8 stacked kernels for one model at the current
RNA_ALGOS_G / RNA_ALGOS_WINDOW settings (pass G as argv[1]; e.g.
`python scripts/stacked_bench.py 32`).  Forced-sync, min over trials.
Round-4 measurements (exact tier, B=192, N=128, v5e): CONTRA 18.6k (G=8)
/ 21.6k (16) / 22.5k (32) / 22.6k (64); Turner 11.2k / 11.7k / 12.5k.
"""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
if len(sys.argv) > 1:
    os.environ["RNA_ALGOS_G"] = sys.argv[1]
import numpy as np, jax.numpy as jnp  # noqa: E402

from rna_algos_tpu.ops import scores as S  # noqa: E402
from rna_algos_tpu.params import build_fold_score_sets  # noqa: E402
from rna_algos_tpu.parallel.runner import pad_seqs  # noqa: E402
from rna_algos_tpu.utils import read_fasta  # noqa: E402
from rna_algos_tpu.utils.trace import force, force_last  # noqa: E402
import rna_algos_tpu.ops.pallas_fold_prob8 as P8  # noqa: E402

B = int(os.environ.get("BENCH_BATCH", "192"))
N = int(os.environ.get("BENCH_N", "128"))
recs = read_fasta(os.path.join(ROOT, "assets", "sampled_trnas.fa"))
batch = ([r.seq for r in recs] * ((B // 6) + 1))[:B]
arr = jnp.asarray(pad_seqs(batch, N))
ns = jnp.asarray(np.array([len(s) for s in batch], dtype=np.int32))
ct = S.contra_table_pytree(build_fold_score_sets())
tt = S.turner_table_pytree()

for model, tbl, fn in (("contra", ct, P8.mccaskill_contra_pallas_prob8),
                       ("turner", tt, P8.mccaskill_turner_pallas_prob8)):
    t0 = time.time()
    bppo, _ = fn(arr, ns, tbl, N=N)
    force(bppo)
    print(f"G{P8.G}/{model}: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        outs = [fn(arr, ns, tbl, N=N) for _ in range(20)]
        force_last(outs[-1][0])
        times.append((time.perf_counter() - t0) / 20)
    dt = min(times)
    print(f"G{P8.G}/{model}: {B/dt:.0f} seqs/s ({dt*1e3:.2f} ms/batch)",
          flush=True)
