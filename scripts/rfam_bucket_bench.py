#!/usr/bin/env python
"""Round-4 measurement probe (see BASELINE.md round-4 sections)."""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.utils.trace import force, force_last
import rna_algos_tpu.ops.pallas_fold_prob8 as P8

N, B = 256, 96
rng = np.random.RandomState(0)
seqs = np.full((B, N), 4, dtype=np.int32)
ns = np.zeros(B, dtype=np.int32)
for k in range(B):
    n = int(rng.randint(150, 201))
    seqs[k, :n] = rng.randint(0, 4, size=n)
    ns[k] = n
seqs, ns = jnp.asarray(seqs), jnp.asarray(ns)
ct = S.contra_table_pytree(build_fold_score_sets())
tt = S.turner_table_pytree()
for name, tbl, fn in (("contra", ct, P8.mccaskill_contra_pallas_prob8),
                      ("turner", tt, P8.mccaskill_turner_pallas_prob8)):
    t0 = time.time()
    bppo, ls = fn(seqs, ns, tbl, N=N)
    force(bppo)
    print(f"G{P8.G} {name} N=256: compile+run {time.time()-t0:.1f}s", flush=True)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [fn(seqs, ns, tbl, N=N) for _ in range(10)]
        force_last(outs[-1][0])
        times.append((time.perf_counter() - t0) / 10)
    dt = min(times)
    print(f"G{P8.G} {name} N=256 B={B}: {B/dt:.0f} seqs/s", flush=True)
