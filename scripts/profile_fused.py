#!/usr/bin/env python
"""Phase profile of the fused McCaskill paths: precompute vs kernels.

Times (min over reps, batch B, bucket N):
  * precompute-only (score-matrix assembly, XLA)
  * full fused (precompute + inside + outside Pallas kernels)
for both models, to locate the next optimization target.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PROF_BATCH", "192"))
N = int(os.environ.get("PROF_N", "128"))
REPS = int(os.environ.get("PROF_REPS", "5"))


def _time(fn, *args):
    # force(): block_until_ready does not wait on tunneled remote devices
    from rna_algos_tpu.utils.trace import force_last

    out = fn(*args)
    force_last(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        force_last(out)
        times.append(time.perf_counter() - t0)
    return min(times)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from functools import partial

    from rna_algos_tpu.ops import pallas_fold as PF
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils import read_fasta

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = read_fasta(os.path.join(root, "assets/sampled_trnas.fa"))
    seqs = [r.seq for r in recs]
    batch = (seqs * ((B + len(seqs) - 1) // len(seqs)))[:B]
    arr = jnp.asarray(pad_seqs(batch, N))
    ns = jnp.asarray(np.array([len(s) for s in batch], dtype=np.int32))
    ct = S.contra_table_pytree(build_fold_score_sets())
    tt = S.turner_table_pytree()

    pre_t = jax.jit(partial(PF.turner_precompute_di, N=N))
    pre_c = jax.jit(partial(PF.contra_precompute_di, N=N))

    out = {}
    out["turner_precompute"] = _time(lambda: pre_t(arr, ns, tt))
    out["turner_full"] = _time(
        lambda: PF.mccaskill_turner_pallas(arr, ns, tt, N=N)
    )
    out["contra_precompute"] = _time(lambda: pre_c(arr, ns, ct))
    out["contra_inside"] = _time(
        lambda: PF.contra_inside_pallas(arr, ns, ct, N=N)
    )
    _, ext, one = PF.contra_inside_pallas(arr, ns, ct, N=N)
    aux = jax.jit(partial(PF.contra_outside_aux, N=N))
    out["contra_outside_aux"] = _time(lambda: aux(ns, ext, one))
    out["contra_full"] = _time(
        lambda: PF.mccaskill_contra_pallas(arr, ns, ct, N=N)
    )
    for k, v in out.items():
        print(json.dumps({
            "phase": k, "batch_ms": round(v * 1e3, 2),
            "per_seq_ms": round(v * 1e3 / B, 3), "B": B, "N": N,
        }))
