"""Headline benchmark: sustained McCaskill BPP throughput on tRNA-scale batches.

Criterion-equivalent of `/root/reference/benches/benches.rs:28-55` (whole-batch
McCaskill wall time on the 6 sampled tRNAs), scaled to a TPU-sized batch: the
6 tRNAs are tiled to a large padded batch, the CONTRAfold model runs the full
inside+outside wavefront per sequence, and we report sequences/second.

The reference publishes no numbers (BASELINE.md). ``vs_baseline`` is anchored
to a MEASUREMENT: native/ref_baseline.json, produced by
``python scripts/ref_baseline.py`` — a reference-faithful single-threaded C
implementation of the same recurrences + cubic f32 numerics
(native/ref_baseline.c, bit-exact vs tests/oracle), timed on this host's CPU
on the same 192-seq tRNA workload, scaled by num_cores (the linear best case
for the reference's per-sequence thread pool). Falls back to an explicit
800 seqs/s estimate only if the measurement file is missing.

Numerics: the bench measures the library DEFAULT mode (``exact``), which on
TPU runs the scaled probability-space kernels (exact f32 sums; BPPs within
the 5e-4 golden budget of the reference cubics — see numerics/logsumexp.py
mode docs).  ``BENCH_NUMERICS=parity`` benches the reference-cubic log-space
kernels; ``=fast`` the hardware-transcendental tier (identical kernels to
exact on this path).

Timing: ``jax.block_until_ready`` does NOT wait on the tunneled remote
device (utils/trace.force docstring) — every sync here fetches a scalar
that data-depends on the output buffer.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
first, then one "roofline" JSON line per measured configuration (VERDICT
round 1, item 3): DP cells/s/chip, a speed-of-light FLOP account, % of the
v5e peak, and an arithmetic-intensity estimate.

Roofline model (documented so the % is judgeable):

* DP cells = sum over sequences of n*(n+1) (inside + outside (i,j) cells).
* Speed-of-light FLOPs per cell at span d: the 2-loop window sum
  win(d) = sum_{t=0}^{min(30, d-2)} (t+1) (<= 496 (k,l) pairs), plus ~3
  O(d) state reductions, plus ~30 constant terms per cell; in probability
  space (fast mode) each term is a multiply-add (2 FLOPs), in log space
  (exact mode) each is a piecewise-cubic LSE (~45 VPU FLOPs).  This is the
  *minimum* arithmetic the recurrences demand — padding, masking, and the
  banded-matmul zero rows the kernels actually execute are NOT counted, so
  pct_of_peak is honest about headroom.
* v5e peaks: MXU ~49.2 TFLOP/s fp32 (197 bf16/4) for the banded-matmul
  fast path; VPU ~3.9 TFLOP/s fp32 for the elementwise exact path.
* HBM bytes/seq ~ seq input + BPP output + ~8 staged N^2 f32 planes
  (window/value buffers); AI = SoL FLOPs / HBM bytes.

`BENCH_ROOFLINE=full` additionally measures the exact-numerics tRNA config
and both numerics at the Rfam-scale bucket (N=256, 150-200 nt) — one
roofline line each (first run pays remote compiles for any new shapes).

Wedge-proofing (VERDICT round 4): before compiling anything the bench
health-probes the backend in a subprocess under a bounded timeout, retries
once after the documented tunnel poison window, and on persistent failure
emits a single parseable JSON line with an ``error`` field instead of a
traceback.  Every emitted line is mirrored to ``bench_artifacts/``
(BENCH_ARTIFACT) so a snapshot-time tunnel failure cannot erase the
round's evidence.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
# Library-default numerics (see module docstring); BENCH_NUMERICS=parity
# benches the reference-cubic mode, =fast the hardware tier.
os.environ["RNA_ALGOS_NUMERICS"] = os.environ.get("BENCH_NUMERICS", "exact")

def emit(obj):
    """Print one JSON line AND mirror it to the in-round artifact file.

    A snapshot-time tunnel failure must never erase the round's perf
    evidence (VERDICT round 4, weak #1): every line this bench prints is
    also appended to ``BENCH_ARTIFACT`` (default
    ``bench_artifacts/last_run.jsonl``), which is committed during the
    round.
    """
    line = json.dumps(obj)
    print(line, flush=True)
    path = os.environ.get(
        "BENCH_ARTIFACT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "bench_artifacts",
            "last_run.jsonl",
        ),
    )
    if path:
        try:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "a") as f:
                f.write(line + "\n")
        except OSError:
            pass  # artifact mirroring must never fail the bench


def _probe_backend(timeout_s):
    """Check the device backend is healthy, in a SUBPROCESS under a timeout.

    The axon failure modes (VERDICT round 4: ``import jax`` hanging >5 min
    with the tunnel wedged, or ``RuntimeError: Unable to initialize backend
    'axon'``) cannot be bounded in-process, so the probe runs a tiny
    matmul + real value fetch in a child and kills it on timeout.  Returns
    (ok, message).
    """
    code = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "x = jnp.ones((8, 8)) @ jnp.ones((8, 8));"
        "v = float(np.asarray(jax.device_get(x))[0, 0]);"
        "assert v == 8.0, v;"
        "print('BACKEND_OK', jax.default_backend())"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            text=True,
            timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False, f"backend probe timed out after {timeout_s}s"
    if r.returncode == 0 and "BACKEND_OK" in r.stdout:
        return True, r.stdout.strip().splitlines()[-1]
    tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
    return False, f"backend probe rc={r.returncode}: " + " | ".join(tail)


def ensure_backend_or_emit_error():
    """Poll backend health; retry once after the wedge poison window.

    On persistent failure emits a single parseable headline JSON line with
    an ``error`` field (instead of dying with a traceback) and returns
    False.  Tunable: BENCH_PROBE_TIMEOUT (s, default 300 — first matmul on
    a cold tunnel takes ~70 s), BENCH_RETRY_S (default 900 — the documented
    10-20 min tunnel poison window).
    """
    probe_t = float(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    retry_s = float(os.environ.get("BENCH_RETRY_S", "900"))
    ok, msg = _probe_backend(probe_t)
    if not ok:
        print(f"# backend unhealthy ({msg}); retrying in {retry_s:.0f}s",
              file=sys.stderr, flush=True)
        time.sleep(retry_s)
        ok, msg = _probe_backend(probe_t)
    if not ok:
        emit(
            {
                "metric": "mccaskill_contra_trna_batch_throughput",
                "value": None,
                "unit": "seqs/s",
                "vs_baseline": None,
                "error": f"device backend unavailable after retry: {msg}",
            }
        )
    return ok


def _reference_baseline_seqs_per_s():
    """Measured CPU-reference throughput per model (see module docstring)."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "native", "ref_baseline.json",
    )
    try:
        with open(path) as f:
            d = json.load(f)
        contra = float(d["all_cores_seqs_per_s_est"])
        turner = float(d.get("turner_all_cores_seqs_per_s_est", contra))
        return contra, turner
    except (OSError, KeyError, ValueError):
        return 800.0, 800.0  # pre-measurement estimate (BASELINE.md)


REFERENCE_EST_SEQS_PER_S, REFERENCE_EST_TURNER_SEQS_PER_S = (
    _reference_baseline_seqs_per_s()
)
BATCH = int(os.environ.get("BENCH_BATCH", "192"))
REPS = int(os.environ.get("BENCH_REPS", "20"))
TRIALS = int(os.environ.get("BENCH_TRIALS", "10"))

# v5e per-chip peaks (jax-ml.github.io/scaling-book hardware tables).
V5E_MXU_F32_PEAK = 197e12 / 4  # bf16 peak / 4 for fp32 accumulation paths
V5E_VPU_F32_PEAK = 3.9e12
V5E_HBM_BW = 819e9


def sol_flops(lengths, mode):
    """Speed-of-light FLOPs for a batch (model in the module docstring)."""
    per_term = 45.0 if mode == "parity" else 2.0
    total = 0.0
    for n in lengths:
        d = np.arange(1, n + 1, dtype=np.float64)
        cells = np.maximum(n - d, 0.0)
        t = np.minimum(30.0, d - 2)
        win = np.where(t >= 0, (t + 1) * (t + 2) / 2.0, 0.0)
        per_cell = win + 3.0 * d + 30.0
        total += 2.0 * per_term * float((cells * per_cell).sum())
    return total


def dp_cells(lengths):
    return float(sum(n * (n + 1) for n in lengths))


def hbm_bytes(lengths, N):
    # seq input + BPP output + ~8 staged N^2 f32 planes per sequence.
    return float(len(lengths)) * (4 * N + 4 * N * N + 8 * 4 * N * N)


def measure(batch, N, mode, contra=True):
    """Sustained forced-sync seqs/s for one (batch, bucket, numerics) config."""
    import jax.numpy as jnp

    from rna_algos_tpu import numerics
    from rna_algos_tpu.models.mccaskill import (
        mccaskill_bpp_batch_auto as mccaskill_bpp_batch,
    )
    from rna_algos_tpu.ops import scores as S
    from rna_algos_tpu.params import build_fold_score_sets
    from rna_algos_tpu.parallel.runner import pad_seqs
    from rna_algos_tpu.utils.trace import force, force_last

    numerics.set_mode(mode)
    arr = jnp.asarray(pad_seqs(batch, N))
    ns = jnp.asarray(np.array([len(s) for s in batch], dtype=np.int32))
    tbl = (
        S.contra_table_pytree(build_fold_score_sets())
        if contra
        else S.turner_table_pytree()
    )

    # compile + warm (force(): block_until_ready does not actually wait on
    # tunneled remote devices — see utils/trace.force)
    out = mccaskill_bpp_batch(arr, ns, tbl, N=N, contra=contra)
    force(out)

    # sustained throughput: enqueue all reps (dispatch latency overlaps
    # device compute exactly as a production serving loop would), then sync
    # once at the end of the pipeline.  Criterion-style min over trials
    # rejects contention jitter on the shared device link.
    times = []
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        outs = [
            mccaskill_bpp_batch(arr, ns, tbl, N=N, contra=contra)
            for _ in range(REPS)
        ]
        # single end-of-pipeline fetch: the device executes in dispatch
        # order and all outputs of a call become ready together, so one
        # element of the last rep's BPPs proves every rep finished --
        # and only one ~30 ms link round-trip lands inside the clock
        force_last(outs[-1][0])
        times.append((time.perf_counter() - t0) / REPS)
    return min(times)


def roofline_line(config, batch, N, mode, dt):
    lengths = [len(s) for s in batch]
    flops = sol_flops(lengths, mode)
    peak = V5E_VPU_F32_PEAK if mode == "parity" else V5E_MXU_F32_PEAK
    bytes_ = hbm_bytes(lengths, N)
    return {
        "metric": "roofline",
        "config": config,
        "numerics": mode,
        "bucket_N": N,
        "batch": len(batch),
        "seqs_per_s": round(len(batch) / dt, 1),
        "dp_cells_per_s": round(dp_cells(lengths) / dt, 0),
        "sol_flops_per_s": round(flops / dt, 0),
        "pct_of_v5e_peak": round(100.0 * flops / dt / peak, 3),
        "arith_intensity_flops_per_byte": round(flops / bytes_, 2),
        "hbm_bound_ceiling_seqs_per_s": round(
            len(batch) * V5E_HBM_BW / bytes_, 0
        ),
    }


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if not ensure_backend_or_emit_error():
        return
    from rna_algos_tpu.models.mccaskill import pallas_available
    from rna_algos_tpu.parallel.runner import pick_bucket
    from rna_algos_tpu.utils import read_fasta

    recs = read_fasta(
        os.path.join(os.path.dirname(__file__), "assets/sampled_trnas.fa")
    )
    seqs = [r.seq for r in recs]
    reps = (BATCH + len(seqs) - 1) // len(seqs)
    batch = (seqs * reps)[:BATCH]

    N = pick_bucket(max(len(s) for s in batch))
    if N == 96 and pallas_available(True, 128):
        N = 128  # fused-kernel buckets are power-of-two

    headline_mode = os.environ.get("BENCH_NUMERICS", "exact")
    try:
        dt = measure(batch, N, headline_mode)
    except Exception as e:  # emit a parseable failure line, not a traceback
        emit(
            {
                "metric": "mccaskill_contra_trna_batch_throughput",
                "value": None,
                "unit": "seqs/s",
                "vs_baseline": None,
                "error": f"{type(e).__name__}: {e}"[:500],
            }
        )
        raise
    seqs_per_s = BATCH / dt
    emit(
        {
            "metric": "mccaskill_contra_trna_batch_throughput",
            "value": round(seqs_per_s, 2),
            "unit": "seqs/s",
            "vs_baseline": round(seqs_per_s / REFERENCE_EST_SEQS_PER_S, 3),
        }
    )
    emit(roofline_line("trna", batch, N, headline_mode, dt))

    # second headline: the Turner model against its own measured baseline
    # (VERDICT round 3, item 4 — the reference benches both models,
    # /root/reference/benches/benches.rs:28-55)
    dt_t = measure(batch, N, headline_mode, contra=False)
    turner_seqs_per_s = BATCH / dt_t
    emit(
        {
            "metric": "mccaskill_turner_trna_batch_throughput",
            "value": round(turner_seqs_per_s, 2),
            "unit": "seqs/s",
            "vs_baseline": round(
                turner_seqs_per_s / REFERENCE_EST_TURNER_SEQS_PER_S, 3
            ),
        }
    )

    if os.environ.get("BENCH_ROOFLINE") == "full":
        others = [m for m in ("exact", "parity") if m != headline_mode]
        for mode in others:
            dt2 = measure(batch, N, mode)
            emit(roofline_line("trna", batch, N, mode, dt2))
        # Rfam-scale bucket: deterministic random 150-200 nt sequences.
        rng = np.random.RandomState(0)
        rbatch = [
            rng.randint(0, 4, size=rng.randint(150, 201)).astype(np.int32)
            for _ in range(96)
        ]
        for mode in [headline_mode] + others:
            dtr = measure(rbatch, 256, mode)
            emit(roofline_line("rfam_scale", rbatch, 256, mode, dtr))


if __name__ == "__main__":
    main()
