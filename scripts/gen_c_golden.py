"""Generate parity-socket self-test goldens from the C baseline (VERDICT r3, item 9).

The reference-Rust golden socket (tests/test_reference_golden.py) had never
fired — no cargo toolchain can exist here, so the file drop is always absent
and every socket test skips.  This script exercises the socket plumbing end
to end with the closest thing this environment has to the reference: the
measured C baseline (native/ref_baseline.c), which implements the
reference's recurrences with the reference's piecewise-cubic f32 numerics
and validates bit-exact against the NumPy oracle.

It runs the C binary per tRNA record for both models and writes
``tests/golden/c_baseline/mccaskill_{turner,contra}.txt`` in the reference
CLI's exact output byte format (`/root/reference/src/bin/mccaskill_algo.rs:
94-113`): header comment, ``>{record index}`` blocks, ``i,j,p `` triples
with Rust-Display f32 repr, unordered-map semantics replaced by
deterministic (i, j) order.  Presence = the close-state keys (the entries
the reference's sparse map would hold), recovered from the C binary's debug
dump.  tests/test_reference_golden.py::test_c_baseline_socket_selftest
diffs our CLI (parity numerics) against these files through the same
parse/compare helpers the real Rust goldens would use.

Run: python scripts/gen_c_golden.py
"""

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
from rna_algos_tpu.utils.output import probs2str_arrays  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "scripts"))
from ref_baseline import (  # noqa: E402
    build,
    write_seqs,
    write_tables,
    write_turner_tables,
)

HEADER = (
    "# Format = >{RNA sequence id} {line break} {basepairing left nucleotide}, "
    "{basepairing right nucleotide}, {basepairing probability} ..."
)


def run_record(exe, tables_bin, seq):
    """(bpp, close_present) dense matrices for one record from the C dump."""
    with tempfile.TemporaryDirectory() as td:
        seqs_bin = os.path.join(td, "one.bin")
        dump = os.path.join(td, "d.bin")
        write_seqs(seqs_bin, [seq])
        subprocess.run([exe, tables_bin, seqs_bin, "1", dump],
                       check=True, capture_output=True)
        raw = open(dump, "rb").read()
    (n,) = struct.unpack("<I", raw[:4])
    sz = 4 * n * n
    bpp = np.frombuffer(raw[4 : 4 + sz], dtype=np.float32).reshape(n, n)
    # dump layout: bpp, ext, close, one (native/ref_baseline.c warm pass)
    close = np.frombuffer(
        raw[4 + 2 * sz : 4 + 3 * sz], dtype=np.float32
    ).reshape(n, n)
    return bpp, np.isfinite(close) & (close != -np.inf)


def main():
    recs = read_fasta(os.path.join(REPO, "assets", "sampled_trnas.fa"))
    trnas = [list(map(int, r.seq)) for r in recs]

    workdir = tempfile.mkdtemp(prefix="cgolden_")
    exe = os.path.join(workdir, "ref_baseline")
    build(exe)
    contra_bin = os.path.join(workdir, "tables_contra.bin")
    turner_bin = os.path.join(workdir, "tables_turner.bin")
    fss = {k: np.asarray(v) for k, v in build_fold_score_sets().items()}
    write_tables(contra_bin, fss)
    write_turner_tables(turner_bin)

    out_dir = os.path.join(REPO, "tests", "golden", "c_baseline")
    os.makedirs(out_dir, exist_ok=True)
    for model, tbin in (("turner", turner_bin), ("contra", contra_bin)):
        parts = [HEADER]
        for rid, seq in enumerate(trnas):
            bpp, present = run_record(exe, tbin, seq)
            iv, jv = np.nonzero(present)
            parts.append(
                f"\n\n>{rid}\n" + probs2str_arrays(iv, jv, bpp[iv, jv])
            )
        path = os.path.join(out_dir, f"mccaskill_{model}.txt")
        with open(path, "w") as f:
            f.write("".join(parts))
        print("wrote", path)


if __name__ == "__main__":
    main()
