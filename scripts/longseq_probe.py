"""N=1024 chunked-kernel attribution probe (VERDICT r2 item 5).

Times the CONTRA chunked inside+outside path at N=1024 with the live-height
ladder CAPPED (monkeypatched) at various heights.  Capping produces WRONG
BPPs — this is a timing probe only — but if wall time scales with the cap,
the per-span tail traffic (history-buffer shifts + reduces, O(ht x N) bytes
per span) is the wall; if it doesn't, the wall is elsewhere (matmul,
extraction, grid machinery).

Run: PROBE_CAP=256 python scripts/longseq_probe.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PROBE_BATCH", "16"))
N = int(os.environ.get("PROBE_N", "1024"))
CAP = int(os.environ.get("PROBE_CAP", "0"))  # 0 = no cap (baseline)


def main():
    import jax.numpy as jnp

    from rna_algos_tpu.ops import pallas_fold_prob as PP
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.utils.trace import force_last

    if CAP:
        orig = PP._live_marks_chunked
        PP._live_marks_chunked = lambda n, r: sorted(
            set(min(h, CAP) for h in orig(n, r))
        )

    rng = np.random.RandomState(3)
    lens = rng.randint(int(N * 0.75), N + 1, size=B).astype(np.int32)
    seqs = np.full((B, N), 4, np.int32)
    for b, l in enumerate(lens):
        seqs[b, :l] = rng.randint(0, 4, size=int(l))
    arr = jnp.asarray(seqs)
    ns = jnp.asarray(lens)
    ct = S.contra_table_pytree(build_fold_score_sets())

    fn = lambda: PP.mccaskill_contra_pallas_prob(arr, ns, ct, N=N)[0]
    out = fn()
    force_last(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(3)]
        force_last(outs[-1])
        times.append((time.perf_counter() - t0) / 3)
    dt = min(times)
    print(json.dumps({
        "probe": "chunked_height_cap", "N": N, "B": B, "cap": CAP or N,
        "ms_per_seq": round(dt * 1e3 / B, 2),
        "seqs_per_s": round(B / dt, 2),
    }))


if __name__ == "__main__":
    main()
