"""Measure the CPU reference baseline (VERDICT round 2, item 2).

Builds native/ref_baseline.c (a reference-faithful single-threaded C
implementation of the CONTRA McCaskill recurrences with the reference's
piecewise-cubic f32 numerics), validates its BPPs against the independent
NumPy oracle (tests/oracle/fold_oracle.py), times the reference workloads
on this host's CPU, and writes the committed measurement to
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


def validate(exe, tables_bin, fss, seq):
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
    fss_np = {k: np.asarray(v) for k, v in fss.items()}
    bpp_dict, _, _ = mccaskill_oracle(seq, uses_contra_model=True, fss=fss_np)
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
    build(exe)
    write_tables(tables_bin, fss)

    err = validate(exe, tables_bin, fss, trnas[0])
    print(f"validation vs NumPy oracle: max |dBPP| = {err:.3g}")
    assert err < 1e-5, err

    results = {}
    # criterion-equivalent: whole 6-tRNA batch
    six = os.path.join(workdir, "six.bin")
    write_seqs(six, trnas)
    out = subprocess.run([exe, tables_bin, six, "20"],
                         check=True, capture_output=True, text=True)
    results["trna6"] = json.loads(out.stdout)
    # bench.py headline workload: 192-seq tRNA batch
    b192 = os.path.join(workdir, "b192.bin")
    write_seqs(b192, [trnas[k % len(trnas)] for k in range(192)])
    out = subprocess.run([exe, tables_bin, b192, "2"],
                         check=True, capture_output=True, text=True)
    results["trna192"] = json.loads(out.stdout)

    ncores = os.cpu_count()
    single = results["trna192"]["seqs_per_s"]
    report = {
        "description": (
            "reference-faithful single-threaded C CONTRA McCaskill "
            "(native/ref_baseline.c), validated vs tests/oracle at <1e-5; "
            "all-cores baseline = single_core x num_cores (linear best case "
            "for the reference's per-sequence thread pool)"
        ),
        "host_cores": ncores,
        "oracle_max_abs_diff": err,
        "runs": results,
        "single_core_seqs_per_s": single,
        "all_cores_seqs_per_s_est": single * ncores,
    }
    out_path = os.path.join(REPO, "native", "ref_baseline.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
