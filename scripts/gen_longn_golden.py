"""Generate the long-n float64 true-math BPP goldens (VERDICT r2, items 5/9).

Runs the vectorized f64 oracle (tests/oracle/fold_oracle_vec.py — validated
cell-for-cell against the scalar brute-force-anchored oracle) on fixed random
sequences at n = 245 and n = 768 for both models, and writes
tests/golden/longn_f64.npz.  tests/test_longn_numerics.py pins the
production kernels and the XLA scan against these matrices.

Run: python scripts/gen_longn_golden.py   (pure NumPy; ~10 min)
"""

import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from rna_algos_tpu.params import build_fold_score_sets  # noqa: E402
from tests.oracle.fold_oracle_vec import mccaskill_oracle_vec  # noqa: E402

CASES = [(245, 11), (768, 17)]


def main():
    fss = {k: np.asarray(v) for k, v in build_fold_score_sets().items()}
    out = {}
    for n, seed in CASES:
        rng = np.random.RandomState(seed)
        seq = rng.randint(0, 4, size=n).astype(np.int32)
        out[f"seq_{n}"] = seq
        for model, contra in (("turner", False), ("contra", True)):
            t0 = time.time()
            bpp, Z = mccaskill_oracle_vec(
                seq, uses_contra_model=contra, fss=fss if contra else None
            )
            out[f"bpp_{n}_{model}"] = bpp.astype(np.float64)
            out[f"Z_{n}_{model}"] = np.float64(Z)
            print(
                f"n={n} {model}: Z={Z:.4f} mass={bpp.sum():.2f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )
    path = os.path.join(ROOT, "tests", "golden", "longn_f64.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
