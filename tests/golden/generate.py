"""Generate golden BPP fixtures from the NumPy oracle (SURVEY §4).

Run from the repo root:  python tests/golden/generate.py
Writes tests/golden/trna_bpps.npz with one dense matrix per
(record, model, allows_short_hairpins) combination.  The oracle is the
brute-force-validated scalar re-derivation of the reference recurrences, so
these files stand in for goldens from the Rust reference (no cargo toolchain
in this environment; see SURVEY §7 risks).
"""

import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, ROOT)

from rna_algos_tpu.params import build_fold_score_sets  # noqa: E402
from rna_algos_tpu.utils import read_fasta  # noqa: E402
from tests.oracle.fold_oracle import mccaskill_oracle  # noqa: E402


def main():
    fss = build_fold_score_sets()
    recs = read_fasta(os.path.join(ROOT, "assets", "sampled_trnas.fa"))
    out = {}
    for k, rec in enumerate(recs):
        seq = np.asarray(rec.seq, dtype=np.int32)
        n = len(seq)
        for model, contra, ash in (
            ("turner", False, False),
            ("contra", True, False),
            ("contra_ash", True, True),
        ):
            bpp, _, _ = mccaskill_oracle(
                seq, uses_contra_model=contra, allows_short_hairpins=ash, fss=fss
            )
            mat = np.zeros((n, n), dtype=np.float32)
            for (i, j), p in bpp.items():
                mat[i, j] = p
            out[f"rec{k}_{model}"] = mat
            print(f"rec{k} {model}: n={n} mass={mat.sum():.3f}", flush=True)
    np.savez_compressed(os.path.join(ROOT, "tests", "golden", "trna_bpps.npz"), **out)
    print("wrote tests/golden/trna_bpps.npz")


if __name__ == "__main__":
    main()
