"""Measure the CPU reference baseline (VERDICT round 2 item 2; round 3
item 4 added the Turner model — the reference benches both,
/root/reference/benches/benches.rs:28-55).

Builds native/ref_baseline.c (a reference-faithful single-threaded C
implementation of the McCaskill recurrences, both models, with the
reference's piecewise-cubic f32 numerics), validates its BPPs against the
independent NumPy oracle (tests/oracle/fold_oracle.py), times the reference
workloads on this host's CPU, and writes the committed measurement to
native/ref_baseline.json.  bench.py derives `vs_baseline` from that file:
baseline seqs/s = measured single-core seqs/s x num_cores (the reference's
thread pool is embarrassingly parallel over sequences —
/root/reference/src/bin/mccaskill_algo.rs:64-93 — so linear scaling is its
best case and keeps our ratio conservative).

Run: python scripts/ref_baseline.py
"""

import json
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from rna_algos_tpu.params import build_fold_score_sets  # noqa: E402
from rna_algos_tpu.utils import read_fasta  # noqa: E402

MAGIC = 0x52424131  # "RBA1"

# (fss key, expected length) in the exact order of the C `Tables` struct.
TABLE_LAYOUT = [
    ("stack_scores", 625),
    ("terminal_mismatch_scores", 625),
    ("helix_close_scores", 25),
    ("dangling_scores_left", 125),
    ("dangling_scores_right", 125),
    ("basepair_scores", 25),
    ("hairpin_scores_len_cumulative", 31),
    ("bulge_scores_len_cumulative", 30),
    ("interior_scores_len_cumulative", 29),
    ("interior_scores_symmetric_cumulative", 15),
    ("interior_scores_asymmetric_cumulative", 28),
    ("interior_scores_explicit", 16),
    ("bulge_scores_0x1", 5),
    ("interior_scores_1x1", 25),
]
SCALARS = [
    "multibranch_score_base",
    "multibranch_score_basepair",
    "multibranch_score_unpair",
    "external_score_basepair",
    "external_score_unpair",
]


def write_tables(path, fss):
    with open(path, "wb") as f:
        f.write(struct.pack("<I", MAGIC))
        for key, want in TABLE_LAYOUT:
            a = np.asarray(fss[key], dtype=np.float32).ravel()
            assert a.size == want, (key, a.size, want)
            f.write(a.tobytes())
        for key in SCALARS:
            f.write(np.float32(fss[key]).tobytes())


MAGIC_TURNER = 0x52425431  # "RBT1"

# (table key, expected size) in the exact order of the C `TTables` struct.
TURNER_TABLE_LAYOUT = [
    ("STACK_SCORES", 625),
    ("TERMINAL_MISMATCH_SCORES_HAIRPIN", 625),
    ("TERMINAL_MISMATCH_SCORES_INTERIOR", 625),
    ("TERMINAL_MISMATCH_SCORES_1XMANY", 625),
    ("TERMINAL_MISMATCH_SCORES_2X3", 625),
    ("TERMINAL_MISMATCH_SCORES_MULTIBRANCH", 625),
    ("DANGLING_SCORES_5PRIME", 125),
    ("DANGLING_SCORES_3PRIME", 125),
    ("HAIRPIN_SCORES_INIT", 31),
    ("BULGE_SCORES_INIT", 31),
    ("INTERIOR_SCORES_INIT", 31),
    ("INTERIOR_SCORES_1X1", 5**6),
    ("INTERIOR_SCORES_1X2", 5**7),
    ("INTERIOR_SCORES_2X2", 5**8),
    ("HAIRPIN_SPECIAL_SCORES", 22),
]
TURNER_SCALARS = [
    "NINIO_COEFF",
    "NINIO_MAX",
    "HELIX_AUGU_END_PENALTY",
    "INIT_MULTIBRANCH_BASE",
    "COEFF_NUM_BRANCHES",
    "COEFF_HAIRPIN_LEN_EXTRAPOLATION",
]


def write_turner_tables(path):
    from rna_algos_tpu.params import turner as T

    tabs = T.active_tables()
    with open(path, "wb") as f:
        f.write(struct.pack("<I", MAGIC_TURNER))
        for key, want in TURNER_TABLE_LAYOUT:
            a = np.asarray(tabs[key], dtype=np.float32).ravel()
            assert a.size == want, (key, a.size, want)
            f.write(a.tobytes())
        for key in TURNER_SCALARS:
            f.write(np.float32(tabs[key]).tobytes())
        seqs = np.asarray(tabs["HAIRPIN_SPECIAL_SEQS"])
        assert seqs.shape == (22, 8), seqs.shape
        # -1 padding -> 255 (never matches a base 0..4)
        f.write(seqs.astype(np.int16).clip(-1, 255).astype(np.uint8).tobytes())
        f.write(np.asarray(tabs["HAIRPIN_SPECIAL_LENS"]).astype(np.uint8).tobytes())


def write_seqs(path, seqs):
    with open(path, "wb") as f:
        f.write(struct.pack("<I", len(seqs)))
        for s in seqs:
            f.write(struct.pack("<I", len(s)))
            f.write(bytes(int(b) for b in s))


def build(exe):
    src = os.path.join(REPO, "native", "ref_baseline.c")
    # -ffp-contract=off: keep each cubic multiply-add a separate rounded
    # f32 op (the reference's numerics; gcc would otherwise fuse to FMA).
    subprocess.run(
        ["gcc", "-O2", "-ffp-contract=off", "-fexcess-precision=standard",
         "-o", exe, src, "-lm"],
        check=True,
    )


def validate(exe, tables_bin, fss, seq, contra=True):
    """Max |BPP| difference vs the NumPy oracle on one tRNA."""
    from tests.oracle.fold_oracle import mccaskill_oracle

    with tempfile.TemporaryDirectory() as td:
        seqs_bin = os.path.join(td, "one.bin")
        dump = os.path.join(td, "bpp0.bin")
        write_seqs(seqs_bin, [seq])
        subprocess.run([exe, tables_bin, seqs_bin, "1", dump],
                       check=True, capture_output=True)
        raw = open(dump, "rb").read()
        (n,) = struct.unpack("<I", raw[:4])
        # dump = bpp + (ext, close, one) debug tables; bpp is first
        c_bpp = np.frombuffer(
            raw[4 : 4 + 4 * n * n], dtype=np.float32
        ).reshape(n, n)
    if contra:
        fss_np = {k: np.asarray(v) for k, v in fss.items()}
        bpp_dict, _, _ = mccaskill_oracle(seq, uses_contra_model=True, fss=fss_np)
    else:
        bpp_dict, _, _ = mccaskill_oracle(seq, uses_contra_model=False)
    py_bpp = np.zeros((n, n), dtype=np.float32)
    for (i, j), p in bpp_dict.items():
        py_bpp[i, j] = p
    return float(np.abs(c_bpp - py_bpp).max())


def main():
    fss = build_fold_score_sets()
    fss = {k: np.asarray(v) for k, v in fss.items()}
    recs = read_fasta(os.path.join(REPO, "assets", "sampled_trnas.fa"))
    trnas = [list(map(int, r.seq)) for r in recs]

    workdir = tempfile.mkdtemp(prefix="refbase_")
    exe = os.path.join(workdir, "ref_baseline")
    tables_bin = os.path.join(workdir, "tables.bin")
    turner_bin = os.path.join(workdir, "tables_turner.bin")
    build(exe)
    write_tables(tables_bin, fss)
    write_turner_tables(turner_bin)

    err = validate(exe, tables_bin, fss, trnas[0])
    print(f"CONTRA validation vs NumPy oracle: max |dBPP| = {err:.3g}")
    assert err < 1e-5, err
    err_t = validate(exe, turner_bin, fss, trnas[0], contra=False)
    print(f"Turner validation vs NumPy oracle: max |dBPP| = {err_t:.3g}")
    assert err_t < 1e-5, err_t

    results = {}
    six = os.path.join(workdir, "six.bin")
    write_seqs(six, trnas)
    b192 = os.path.join(workdir, "b192.bin")
    write_seqs(b192, [trnas[k % len(trnas)] for k in range(192)])
    for model, tbin in (("contra", tables_bin), ("turner", turner_bin)):
        # criterion-equivalent: whole 6-tRNA batch
        out = subprocess.run([exe, tbin, six, "20"],
                             check=True, capture_output=True, text=True)
        results[f"trna6_{model}"] = json.loads(out.stdout)
        # bench.py headline workload: 192-seq tRNA batch
        out = subprocess.run([exe, tbin, b192, "2"],
                             check=True, capture_output=True, text=True)
        results[f"trna192_{model}"] = json.loads(out.stdout)
    # legacy keys (round-3 consumers)
    results["trna6"] = results["trna6_contra"]
    results["trna192"] = results["trna192_contra"]

    ncores = os.cpu_count()
    single = results["trna192_contra"]["seqs_per_s"]
    single_t = results["trna192_turner"]["seqs_per_s"]
    report = {
        "description": (
            "reference-faithful single-threaded C McCaskill, both models "
            "(native/ref_baseline.c), validated vs tests/oracle at <1e-5; "
            "all-cores baseline = single_core x num_cores (linear best case "
            "for the reference's per-sequence thread pool)"
        ),
        "host_cores": ncores,
        "oracle_max_abs_diff": err,
        "oracle_max_abs_diff_turner": err_t,
        "runs": results,
        "single_core_seqs_per_s": single,
        "all_cores_seqs_per_s_est": single * ncores,
        "turner_single_core_seqs_per_s": single_t,
        "turner_all_cores_seqs_per_s_est": single_t * ncores,
    }
    out_path = os.path.join(REPO, "native", "ref_baseline.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
