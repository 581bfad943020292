#!/usr/bin/env python
"""Stage profile of the stacked (G=8) scaled-probability CONTRA path.

Times cumulative prefixes of ops/pallas_fold_prob8._prob8_run_body at a
fixed ln_sigma (taken from one converged full run, so no retries fire)
via its ``upto`` argument, then differences them into per-stage costs:

  pmats                contra_prob_mats precompute (XLA)
  iprep                inside-table merges + interleave + banded kernel
                       assembly + vec rows (XLA)
  inside_kernel        stacked inside Pallas kernel
  aux                  dilv + re-mask + contra_outside_aux (XLA)
  oprep                outside-table merges + interleaves (XLA)
  outside_kernel+dilv  stacked outside Pallas kernel + final dilv
  retry_oh             full public entry minus the fixed-ls body

Caveat: each cumulative prefix ends at a different XLA fusion boundary, so
stage differences are approximate where XLA would have fused across them.
"""

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("RNA_ALGOS_NUMERICS", "fast")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PROF_BATCH", "192"))
N = int(os.environ.get("PROF_N", "128"))
REPS = int(os.environ.get("PROF_REPS", "10"))


def _time(fn):
    from rna_algos_tpu.utils.trace import force_last

    out = fn()
    force_last(out)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn()
        force_last(out)
        times.append((time.perf_counter() - t0) / 5)
    return min(times)


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from rna_algos_tpu.ops import pallas_fold_prob as PP
    from rna_algos_tpu.ops import pallas_fold_prob8 as P8
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

    if B % P8.G != 0:
        sys.exit(f"PROF_BATCH={B} must be a multiple of the prob8 group size G={P8.G}")

    full = partial(P8.mccaskill_contra_pallas_prob8, arr, ns, ct, N=N)
    _bppo, ls = full()
    ls = jax.device_get(ls)
    ls = jnp.asarray(ls)

    @partial(jax.jit, static_argnames=("upto",))
    def prefix(ls, upto):
        if upto == "pmats":
            # the AGED path's real precompute (round 5: the round-4
            # profiler timed the UNUSED old per-seq builder here, which
            # misattributed the precompute cost)
            return P8.contra_prob_mats_merged(arr, ns, ct, ls, N)[0]
        return P8._prob8_run_body(
            arr, ns, ct, ls, N, False, False,
            upto=None if upto == "full" else upto,
        )

    out = {}
    for stage in ("pmats", "iprep", "inside", "aux", "oprep", "full"):
        out[stage + "_cum"] = _time(lambda s=stage: prefix(ls, upto=s))
    out["entry_cum"] = _time(full)

    stages = {
        "pmats": out["pmats_cum"],
        "iprep": out["iprep_cum"] - out["pmats_cum"],
        "inside_kernel": out["inside_cum"] - out["iprep_cum"],
        "aux": out["aux_cum"] - out["inside_cum"],
        "oprep": out["oprep_cum"] - out["aux_cum"],
        "outside_kernel+dilv": out["full_cum"] - out["oprep_cum"],
        "retry_oh": out["entry_cum"] - out["full_cum"],
    }
    for k, v in {**out, **stages}.items():
        print(json.dumps({
            "phase": k, "batch_ms": round(v * 1e3, 2),
            "per_seq_us": round(v * 1e6 / B, 1), "B": B, "N": N,
        }))
