"""n=1536 float64 true-math golden (VERDICT r3, item 3: open N=2048).

Same generator as scripts/gen_longn_golden.py, one case at n=1536 (the
middle of the 1025-2048 tier), written to a separate file so the main
longn_f64.npz stays untouched.  Run: python scripts/gen_longn_golden_1536.py
"""
import os, sys, time
import numpy as np
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
from rna_algos_tpu.params import build_fold_score_sets  # noqa: E402
from tests.oracle.fold_oracle_vec import mccaskill_oracle_vec  # noqa: E402


def main():
    fss = {k: np.asarray(v) for k, v in build_fold_score_sets().items()}
    out = {}
    n, seed = 1536, 23
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
        print(f"n={n} {model}: Z={Z:.4f} mass={bpp.sum():.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)
    np.savez_compressed(
        os.path.join(ROOT, "tests", "golden", "longn_f64_1536.npz"), **out
    )
    print("wrote tests/golden/longn_f64_1536.npz")


if __name__ == "__main__":
    main()
