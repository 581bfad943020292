#!/usr/bin/env python
"""N=512 chunked-kernel validation: Mosaic compile + parity vs the XLA scan.

The span-chunked prob kernels (ops/pallas_fold_prob.py) extend the fused
path past the all-VMEM N<=256 budget.  This script compiles them at N=512
on the real TPU, checks BPP parity against the XLA wavefront scan
(reference cubics), and times both.

Budget note: the arbiter here is the CUBIC scan, and the cubics
themselves drift at long n — measured against the f64 oracle at n=245
(random seq), the prob kernels are 3.9e-6 from truth while the
piecewise-cubic scan is 2.0e-3 off.  The 3e-3 budget below bounds the
cubics' drift, not the kernels'.

Env: PARITY_BATCH (default 16), PARITY_SKIP_XLA=1 to skip the slow scan,
PARITY_MODEL=contra|turner (default contra), PARITY_N (default 512;
1024 exercises the second chunked tier), PARITY_CROSS=1 to additionally
run sequences short enough for the N/2 bucket through BOTH bucket
programs and diff the BPPs (validates the chunk machinery at the larger
N against the already-validated smaller program, without the
prohibitively slow XLA scan at N=1024).
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PARITY_BATCH", "16"))
N = int(os.environ.get("PARITY_N", "512"))


def main():
    import jax.numpy as jnp

    from rna_algos_tpu.models.mccaskill import (
        mccaskill_bpp_batch,
        _prob_finish,
    )
    from rna_algos_tpu.ops import pallas_fold_prob as PP
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.utils.trace import force, force_last

    model = os.environ.get("PARITY_MODEL", "contra")
    contra = model == "contra"
    rng = np.random.RandomState(3)
    lens = rng.randint(int(N * 0.75), N + 1, size=B).astype(np.int32)
    seqs = np.full((B, N), 4, np.int32)
    for b, l in enumerate(lens):
        seqs[b, :l] = rng.randint(0, 4, size=int(l))
    arr = jnp.asarray(seqs)
    ns = jnp.asarray(lens)
    if contra:
        ct = S.contra_table_pytree(build_fold_score_sets())
        run = lambda: PP.mccaskill_contra_pallas_prob(arr, ns, ct, N=N)
    else:
        ct = S.turner_table_pytree()
        run = lambda: PP.mccaskill_turner_pallas_prob(arr, ns, ct, N=N)

    t0 = time.perf_counter()
    bppo, ls = run()
    bpp_p, _pres = _prob_finish(bppo, ns, N=N)
    bpp_p = np.asarray(bpp_p)
    t_compile = time.perf_counter() - t0
    print(json.dumps({"phase": "chunked_compile+run_s",
                      "value": round(t_compile, 1)}), flush=True)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run() for _ in range(3)]
        force_last(outs[-1][0])
        times.append((time.perf_counter() - t0) / 3)
    dt = min(times)
    print(json.dumps({
        "metric": "longseq_fused_chunked", "model": model, "N": N, "batch": B,
        "seqs_per_s": round(B / dt, 2),
        "ms_per_seq": round(dt / B * 1e3, 2),
    }), flush=True)

    assert np.isfinite(bpp_p).all(), "non-finite BPPs"
    lo, hi = bpp_p.min(), bpp_p.max()
    print(json.dumps({"phase": "bounds", "min": float(lo),
                      "max": float(hi)}), flush=True)
    assert lo >= -1e-3 and hi <= 1 + 1e-3, "BPP bounds violated"

    if os.environ.get("PARITY_CROSS") == "1":
        # bucket-crossing parity: sequences that fit the N/2 bucket run
        # through BOTH chunked programs; differences are pure chunking/
        # reassociation effects of the larger grid
        N2 = N // 2
        lens2 = rng.randint(int(N2 * 0.75), N2 + 1, size=B).astype(np.int32)
        seqs2 = np.full((B, N), 4, np.int32)
        for b, l in enumerate(lens2):
            seqs2[b, :l] = rng.randint(0, 4, size=int(l))
        arr_big = jnp.asarray(seqs2)
        arr_small = jnp.asarray(seqs2[:, :N2])
        ns2 = jnp.asarray(lens2)
        if contra:
            run_b = lambda a, nn: PP.mccaskill_contra_pallas_prob(
                a, ns2, ct, N=nn
            )
        else:
            run_b = lambda a, nn: PP.mccaskill_turner_pallas_prob(
                a, ns2, ct, N=nn
            )
        bppo_b, _ = run_b(arr_big, N)
        bpp_b, _ = _prob_finish(bppo_b, ns2, N=N)
        bppo_s, _ = run_b(arr_small, N2)
        bpp_s, _ = _prob_finish(bppo_s, ns2, N=N2)
        bpp_b = np.asarray(bpp_b)[:, :N2, :N2]
        bpp_s = np.asarray(bpp_s)
        d = np.max(np.abs(bpp_b - bpp_s))
        print(json.dumps({
            "phase": "bucket_cross_parity", "N_big": N, "N_small": N2,
            "max_abs_diff": float(d), "ok": bool(d <= 1e-5),
        }), flush=True)
        assert d <= 1e-5, f"bucket-cross parity failed: {d}"

    if os.environ.get("PARITY_SKIP_XLA") != "1":
        t0 = time.perf_counter()
        bpp_x, _ = mccaskill_bpp_batch(arr, ns, ct, N=N, contra=contra)
        force(bpp_x)
        bpp_x = np.asarray(bpp_x)
        t_x = time.perf_counter() - t0
        d = np.max(np.abs(bpp_p - bpp_x))
        print(json.dumps({
            "phase": "xla_parity", "max_abs_diff": float(d),
            "xla_s": round(t_x, 1), "ok": bool(d <= 3e-3),
        }), flush=True)
        assert d <= 3e-3, f"parity vs XLA scan failed: {d}"
    print("PASS")


if __name__ == "__main__":
    main()
