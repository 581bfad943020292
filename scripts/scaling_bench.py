#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness (BASELINE.md metric #2).

Measures batched McCaskill throughput at 1..K devices on a 1-D data mesh
(weak scaling: fixed per-device batch) and reports per-device efficiency.
On this environment only one real TPU chip is reachable, so the
multi-device points run on the VIRTUAL CPU mesh
(--xla_force_host_platform_device_count) — a correctness-faithful proxy
for the sharding program (same shard_map, same collectives), but NOT a
hardware-faithful one: the N virtual devices share this host's physical
cores (4 here), so wall-clock efficiency is compute-capped at
n_cores/n_devices once n_devices > n_cores.  The committed artifact
therefore reports both the raw wall efficiency AND the
oversubscription-corrected bound; on a real pod slice the same script
measures true ICI scaling.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_bench.py [ndev ...]       # default 1 2 4 8
Env: SCALING_PER_DEV (default 16), SCALING_REPS (4), SCALING_TRIALS (3),
     SCALING_OUT (artifact path; default bench_artifacts/scaling_cpu_mesh.json)
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
    from jax.numpy import asarray as jnp_asarray

    from rna_algos_tpu.models.mccaskill import mccaskill_bpp_batch
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel import mesh as mesh_lib
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils import read_fasta
    from rna_algos_tpu.utils.trace import force, force_last

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    recs = read_fasta(os.path.join(root, "assets/sampled_trnas.fa"))
    seqs = [r.seq for r in recs]
    tbl = S.contra_table_pytree(build_fold_score_sets())
    N = 96
    per_dev = int(os.environ.get("SCALING_PER_DEV", "16"))
    reps = int(os.environ.get("SCALING_REPS", "4"))
    trials = int(os.environ.get("SCALING_TRIALS", "3"))

    devices = jax.devices()
    if len(devices) < max(ndevs):
        devices = jax.devices("cpu")
    ncores = os.cpu_count() or 1
    on_cpu = devices[0].platform == "cpu"

    # Fixed TOTAL batch across every point.  On this host the XLA "cpu"
    # backend is itself multi-threaded — a 1-"device" run already uses all
    # physical cores — so per-device speedup is not measurable on the
    # virtual mesh.  What IS measurable (and what transfers to a real pod
    # slice) is the SHARDING OVERHEAD: the same total batch through the
    # shard_map program at nd devices vs. unsharded.  efficiency = 1.0
    # means the distributed program (sharding, per-shard dispatch,
    # result assembly) added no cost over the single-device program.
    B = per_dev * max(ndevs)
    batch = (seqs * ((B + len(seqs) - 1) // len(seqs)))[:B]
    arr = pad_seqs(batch, N)
    ns = np.array([len(s) for s in batch], dtype=np.int32)

    def _measure(arr_x, ns_x):
        out = mccaskill_bpp_batch(arr_x, ns_x, tbl, N=N, contra=True)
        force(out)  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            outs = [
                mccaskill_bpp_batch(arr_x, ns_x, tbl, N=N, contra=True)
                for _ in range(reps)
            ]
            force_last(outs[-1][0])
            best = min(best, (time.perf_counter() - t0) / reps)
        return B / best

    # the unsharded anchor must live on the SAME backend as the mesh
    # points (plain numpy operands would land on the default device —
    # the TPU — and measure the wrong program entirely)
    anchor_dev = devices[0]
    unsharded = _measure(
        jax.device_put(jnp_asarray(arr), anchor_dev),
        jax.device_put(jnp_asarray(ns), anchor_dev),
    )
    print(f"# unsharded: {unsharded:.1f} seqs/s", file=sys.stderr)
    results = {}
    for nd in ndevs:
        mesh = mesh_lib.data_mesh(devices[:nd])
        arr_s, ns_s = mesh_lib.shard_batch(mesh, arr, ns)
        results[nd] = _measure(arr_s, ns_s)
        print(f"# {nd} device(s): {results[nd]:.1f} seqs/s", file=sys.stderr)

    base1 = results.get(1, results[ndevs[0]])
    report = {
        "platform": devices[0].platform,
        "n_physical_cores": ncores,
        "total_batch": B,
        "bucket_N": N,
        "unsharded_seqs_per_s": unsharded,
        "sharded_seqs_per_s": results,
        # 1-device mesh vs plain jit on the same device: the cost of the
        # shard_map wrapper itself (1.0 = free)
        "shard_map_overhead_1dev": base1 / unsharded,
        # fixed-total-batch speedup vs the 1-device mesh point: on the
        # virtual CPU mesh this measures how well per-device executors
        # use the physical cores (ceiling = min(nd, n_cores)); on a real
        # pod slice it measures true scaling
        "speedup_vs_1dev": {nd: results[nd] / base1 for nd in ndevs},
        "core_parallel_efficiency": {
            nd: results[nd] / base1 / min(nd, ncores) for nd in ndevs
        },
        "note": (
            "virtual CPU-mesh proxy: same shard_map program as a real "
            "pod slice, but the nd virtual devices share this host's "
            f"{ncores} physical cores; the forward data-parallel fold "
            "has NO cross-device collectives, so the residual gap is "
            "host-core oversubscription + per-device executor threading, "
            "not communication"
            if on_cpu
            else "real device mesh"
        ),
    }
    print(json.dumps(report, indent=2, default=float))
    out_path = os.environ.get(
        "SCALING_OUT",
        os.path.join(root, "bench_artifacts", "scaling_cpu_mesh.json"),
    )
    if out_path:
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2, default=float)
    return report


if __name__ == "__main__":
    ndevs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    run(ndevs)
