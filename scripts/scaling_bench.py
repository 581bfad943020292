#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness (BASELINE.md metric #2).

Measures batched McCaskill throughput at 1..K devices on a 1-D data mesh and
reports per-device efficiency.  On this environment only one real TPU chip is
reachable, so the multi-device points run on the virtual CPU mesh
(--xla_force_host_platform_device_count); on a real pod slice the same script
measures true ICI scaling.

Usage: python scripts/scaling_bench.py [ndev ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(ndevs):
    import jax
    import jax.numpy as jnp

    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel import mesh as mesh_lib
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils import read_fasta

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = read_fasta(os.path.join(root, "assets/sampled_trnas.fa"))
    seqs = [r.seq for r in recs]
    tbl = S.contra_table_pytree(build_fold_score_sets())
    N = 96
    per_dev = int(os.environ.get("SCALING_PER_DEV", "16"))

    devices = jax.devices()
    if len(devices) < max(ndevs):
        devices = jax.devices("cpu")

    results = {}
    for nd in ndevs:
        mesh = mesh_lib.data_mesh(devices[:nd])
        B = per_dev * nd
        batch = (seqs * ((B + len(seqs) - 1) // len(seqs)))[:B]
        arr = pad_seqs(batch, N)
        ns = np.array([len(s) for s in batch], dtype=np.int32)
        arr_s, ns_s = mesh_lib.shard_batch(mesh, arr, ns)
        from rna_algos_tpu.utils.trace import force_last

        out = mccaskill_bpp_batch(arr_s, ns_s, tbl, N=N, contra=True)
        force_last(out)
        t0 = time.perf_counter()
        out = mccaskill_bpp_batch(arr_s, ns_s, tbl, N=N, contra=True)
        force_last(out)
        dt = time.perf_counter() - t0
        results[nd] = B / dt
    base = results[ndevs[0]] / ndevs[0]
    report = {
        "seqs_per_s": results,
        "efficiency": {nd: results[nd] / (nd * base) for nd in ndevs},
    }
    print(json.dumps(report, indent=2, default=float))
    return report


if __name__ == "__main__":
    ndevs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    run(ndevs)
