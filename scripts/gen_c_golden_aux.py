"""Generate centroid + Durbin parity-socket goldens (VERDICT r4, item 7).

Extends scripts/gen_c_golden.py (which covers the two McCaskill CLIs) to the
remaining reference-Rust golden sockets: ``durbin.txt`` and the two
``centroid_{turner,contra}/`` directories — so ALL of
tests/test_reference_golden.py's expected file-drop surfaces are exercised
end to end by committed fixtures (the real Rust binaries still cannot be
built here; these goldens come from the repo's INDEPENDENT cubic-f32
implementations of the reference algorithms).

* ``durbin.txt`` — the scalar NumPy Durbin oracle (tests/oracle/
  durbin_oracle.py: literal re-derivation of
  /root/reference/src/durbin_algo.rs:73-242 with the reference's streaming
  cubic logsumexp order), every unordered tRNA pair, written in the
  reference CLI byte format (bin/durbin_algo.rs:76-89: header, ``>{i},{j}``
  blocks, sentinel-offset ``i,j,p `` triples with Rust-Display f32 repr).
* ``centroid_{turner,contra}/centroid_threshold={g}.fa`` — C-baseline BPPs
  (native/ref_baseline.c, bit-exact vs the oracle) through the scalar MEA
  fill oracle (tests/oracle/centroid_oracle.py: centroid_fold.rs:35-64) and
  a reference-faithful scalar traceback (centroid_fold.rs:66-102), full
  2^-7..2^10 gamma grid, one file per gamma
  (bin/centroid_fold.rs:148-161,165-207).

Run: python scripts/gen_c_golden_aux.py   (CPU-only, a few minutes)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from rna_algos_tpu.constants import PSEUDO_BASE  # noqa: E402
from rna_algos_tpu.params import build_align_scores  # noqa: E402
from rna_algos_tpu.utils import read_fasta  # noqa: E402
from rna_algos_tpu.utils.output import (  # noqa: E402
    _fmt,
    fold_str,
    probs2str_arrays,
)

from tests.oracle.centroid_oracle import mea_fill_oracle  # noqa: E402
from tests.oracle.durbin_oracle import durbin_oracle  # noqa: E402

DURBIN_HEADER = (
    "# Format = >{RNA sequence id 1},{RNA sequence id 2} {line break} "
    "{nucleotide 1}, {nucleotide 2}, {nucletide matching probability} ..."
)

# The reference's gamma grid (bin/centroid_fold.rs:9-10,148-161).
GAMMAS = [2.0 ** e for e in range(-7, 11)]

F = np.float32


def traceback_oracle(M, bpp, gamma, n):
    """Scalar stack traceback (centroid_fold.rs:66-102 candidate order)."""
    gamma = F(gamma)
    one = F(1.0)
    pairs = []
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i:
            continue
        m = M[i, j]
        if m == F(0.0):
            continue
        if m == M[i + 1, j]:
            stack.append((i + 1, j))
        elif m == M[i, j - 1]:
            stack.append((i, j - 1))
        elif bpp[i, j] > 0.0 and m == F(
            (M[i + 1, j - 1] + F(gamma * bpp[i, j])) - one
        ):
            stack.append((i + 1, j - 1))
            pairs.append((i, j))
        else:
            for k in range(i + 1, j):
                if m == F(M[i, k] + M[k + 1, j]):
                    stack.append((i, k))
                    stack.append((k + 1, j))
                    break
    return pairs


def gen_durbin(trnas, out_dir):
    sc = build_align_scores()
    wrapped = [
        [PSEUDO_BASE] + list(seq) + [PSEUDO_BASE] for seq in trnas
    ]
    parts = [DURBIN_HEADER]
    n = len(wrapped)
    for a in range(n):
        for b in range(a + 1, n):
            probs = durbin_oracle(wrapped[a], wrapped[b], sc)
            iv, jv = np.nonzero(probs > 0.0)
            parts.append(
                f"\n\n>{a},{b}\n"
                + probs2str_arrays(iv - 1, jv - 1, probs[iv, jv])
            )
            print(f"  durbin pair ({a},{b}) done", flush=True)
    path = os.path.join(out_dir, "durbin.txt")
    with open(path, "w") as f:
        f.write("".join(parts))
    print("wrote", path)


def gen_centroid(trnas, out_dir):
    # C-baseline BPPs per record per model (same harness gen_c_golden uses)
    import tempfile

    from gen_c_golden import run_record
    from ref_baseline import build, write_seqs, write_tables, write_turner_tables
    from rna_algos_tpu.params import build_fold_score_sets

    workdir = tempfile.mkdtemp(prefix="cgolden_aux_")
    exe = os.path.join(workdir, "ref_baseline")
    build(exe)
    contra_bin = os.path.join(workdir, "tables_contra.bin")
    turner_bin = os.path.join(workdir, "tables_turner.bin")
    fss = {k: np.asarray(v) for k, v in build_fold_score_sets().items()}
    write_tables(contra_bin, fss)
    write_turner_tables(turner_bin)

    for model, tbin in (("turner", turner_bin), ("contra", contra_bin)):
        bpps = []
        for seq in trnas:
            bpp, _present = run_record(exe, tbin, seq)
            bpps.append(np.asarray(bpp, dtype=np.float32))
        mdir = os.path.join(out_dir, f"centroid_{model}")
        os.makedirs(mdir, exist_ok=True)
        for gamma in GAMMAS:
            lines = []
            for rid, (seq, bpp) in enumerate(zip(trnas, bpps)):
                n = len(seq)
                M = mea_fill_oracle(bpp, n, gamma)
                pairs = traceback_oracle(M, bpp, gamma, n)
                tail = "\n" if rid < len(trnas) - 1 else ""
                lines.append(f">{rid}\n" + fold_str(pairs, n) + tail)
            path = os.path.join(mdir, f"centroid_threshold={_fmt(gamma)}.fa")
            with open(path, "w") as f:
                f.write("".join(lines))
        print(f"wrote {mdir}/ ({len(GAMMAS)} gamma files)")


def main():
    recs = read_fasta(os.path.join(REPO, "assets", "sampled_trnas.fa"))
    trnas = [list(map(int, r.seq)) for r in recs]
    out_dir = os.path.join(REPO, "tests", "golden", "c_baseline")
    os.makedirs(out_dir, exist_ok=True)
    gen_centroid(trnas, out_dir)
    gen_durbin(trnas, out_dir)


if __name__ == "__main__":
    main()
