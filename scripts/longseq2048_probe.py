#!/usr/bin/env python
"""Round-4 measurement probe (see BASELINE.md round-4 sections)."""
import os, sys, time
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import numpy as np, jax, jax.numpy as jnp
from rna_algos_tpu.ops import scores as S
from rna_algos_tpu.ops import pallas_fold_prob as PP
from rna_algos_tpu.params import build_fold_score_sets
from rna_algos_tpu.utils.trace import force, force_last

N, B = 2048, 4
z = np.load(os.path.join(ROOT, 'tests', 'golden', 'longn_f64_1536.npz'))
gseq = z['seq_1536']
rng = np.random.default_rng(5)
seqs = np.full((B, N), 4, dtype=np.int32)
ns = np.zeros(B, dtype=np.int32)
seqs[0, :1536] = gseq; ns[0] = 1536
for k in range(1, B):
    n = int(rng.integers(1500, 2001))
    seqs[k, :n] = rng.integers(0, 4, size=n)
    ns[k] = n
seqs, ns = jnp.asarray(seqs), jnp.asarray(ns)
ct = S.contra_table_pytree(build_fold_score_sets())
t0 = time.time()
bppo, ls = PP.mccaskill_contra_pallas_prob(seqs, ns, ct, N=N)
force(bppo)
print(f"contra N=2048: compile+run {time.time()-t0:.1f}s", flush=True)
# golden check on lane 0 (n=1536)
from rna_algos_tpu.models.mccaskill import _prob_finish
bpp, _ = _prob_finish(bppo, ns, N=N)
got = np.asarray(bpp[0])[:1536, :1536]
want = z['bpp_1536_contra']
print("contra n=1536 max |dBPP| vs f64 golden:", np.abs(got - want).max(), flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter()
    outs = [PP.mccaskill_contra_pallas_prob(seqs, ns, ct, N=N) for _ in range(3)]
    force_last(outs[-1][0])
    times.append((time.perf_counter() - t0) / 3)
dt = min(times)
print(f"contra N=2048: {B/dt:.2f} seqs/s ({dt*1e3/B:.1f} ms/seq)", flush=True)
