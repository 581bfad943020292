#!/usr/bin/env python
"""Stage split of the Turner fast-path precompute (VERDICT item 10 follow-up).

Times, at the bench config (B=192, N=128): PF.turner_precompute_di alone,
turner_prob_mats (precompute + exp transform), and the CONTRA equivalents,
so the 14.8 ms pmats cost can be attributed to lookup/skew vs exp traffic.
"""

import json
import os
import sys
import time

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

    from rna_algos_tpu.ops import pallas_fold as PF
    from rna_algos_tpu.ops import pallas_fold_prob as PP
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
    ls = jnp.full((B,), -0.05, jnp.float32)

    t_pre = _time(jax.jit(lambda: PF.turner_precompute_di(arr, ns, tt, N)),
                  force_last)
    t_pm = _time(jax.jit(lambda: PP.turner_prob_mats(arr, ns, tt, ls, N)),
                 force_last)
    t_cpre = _time(jax.jit(lambda: PF.contra_precompute_di(arr, ns, ct, N)),
                   force_last)
    t_cpm = _time(jax.jit(lambda: PP.contra_prob_mats(arr, ns, ct, ls, N)),
                  force_last)
    for k, v in (
        ("turner_precompute_di", t_pre),
        ("turner_prob_mats", t_pm),
        ("turner_exp_pass", t_pm - t_pre),
        ("contra_precompute_di", t_cpre),
        ("contra_prob_mats", t_cpm),
        ("contra_exp_pass", t_cpm - t_cpre),
    ):
        print(json.dumps({
            "phase": k, "batch_ms": round(v * 1e3, 2),
            "per_seq_us": round(v * 1e6 / B, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
