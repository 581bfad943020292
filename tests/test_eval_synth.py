"""Synthetic seed set + the independent threshold-estimator arm.

Covers VERDICT round 1 items 4/5: the dataset generator feeding the real
end-to-end eval run (scripts/run_eval.py -> eval_artifacts/) and the second
program column.  A CI accuracy gate pins PPV/MCC on a small slice so
estimator regressions fail the suite (the committed full-run artifact is
eval_artifacts/eval_report.json).
"""

import json
import os

import numpy as np
import pytest

from rna_algos_tpu.eval import synth
from rna_algos_tpu.eval.baseline import threshold_pairs
from rna_algos_tpu.eval.rfam import compile_rna_fams, parse_stockholm


def test_generate_seed_set_roundtrip(tmp_path):
    sth = tmp_path / "seed.sth"
    n_valid = synth.generate_seed_set(str(sth), n_families=5)
    assert n_valid == 5
    fams = list(parse_stockholm(str(sth)))
    assert len(fams) == 8  # 5 valid + 3 out-of-spec
    for rows, ss in fams:
        assert len(ss) == len(rows[0][1])
        # balanced structure
        assert ss.count("(") == ss.count(")")

    seq_dir, ss_dir = tmp_path / "seqs", tmp_path / "sss"
    n = compile_rna_fams(str(sth), str(seq_dir), str(ss_dir))
    assert n == 5  # the 3 out-of-spec families are filtered
    # reference structures project pairs onto ungapped coordinates
    from rna_algos_tpu.eval.stats import read_sss

    for k in range(n):
        sss = read_sss(str(ss_dir / f"rna_fam_{k}.fa"))
        assert any(len(s) > 0 for s in sss)  # real pairs survive projection


def test_member_sequences_compatible_with_template(tmp_path):
    rng = np.random.default_rng(7)
    rows, ss = synth.sample_family(rng, 5, 90)
    pairs = synth.pair_table(ss)
    wc = {("A", "U"), ("U", "A"), ("C", "G"), ("G", "C"), ("G", "U"), ("U", "G")}
    for _, seq in rows:
        for i, j in pairs:
            if seq[i] == "-" or seq[j] == "-":
                continue
            assert (seq[i], seq[j]) in wc, (i, j, seq[i], seq[j])


def test_threshold_pairs_greedy_rules():
    n = 8
    bpp = np.zeros((n, n), dtype=np.float32)
    bpp[0, 7] = 0.9
    bpp[1, 6] = 0.8
    bpp[2, 5] = 0.7
    bpp[1, 4] = 0.6   # conflicts with (1, 6) on base 1
    bpp[3, 6] = 0.55  # crosses (2, 5) and shares base 6
    got = threshold_pairs(bpp, n, gamma=4.0)  # thr = 0.2
    assert got == [(0, 7), (1, 6), (2, 5)]
    # high threshold drops everything
    assert threshold_pairs(bpp, n, gamma=0.05) == []


def test_threshold_crossing_rejection():
    n = 6
    bpp = np.zeros((n, n), dtype=np.float32)
    bpp[0, 3] = 0.9
    bpp[2, 5] = 0.8  # crosses (0, 3)
    assert threshold_pairs(bpp, n, gamma=4.0) == [(0, 3)]


@pytest.mark.slow
def test_eval_accuracy_gate(tmp_path):
    """CI accuracy regression gate: on a small synthetic slice the centroid
    estimator must beat minimum PPV/MCC (structures are sampled compatible
    with the generating template, so a correct engine scores well)."""
    from rna_algos_tpu.eval.pipeline import run_all

    sth = tmp_path / "seed.sth"
    synth.generate_seed_set(str(sth), n_families=3, seed=11)
    report = run_all(str(sth), str(tmp_path / "work"), models=("contra",))
    rows = report["curves"]["centroid_estimator_contra"]
    best_mcc = max(r["mcc"] for r in rows if r["mcc"] == r["mcc"])
    best_f1 = max(r["f1"] for r in rows if r["f1"] == r["f1"])
    assert best_mcc > 0.3, best_mcc
    assert best_f1 > 0.3, best_f1
    # the comparison arm produced its column too
    rows_t = report["curves"]["threshold_estimator_contra"]
    assert len(rows_t) == 18


def test_committed_eval_artifact_sanity():
    """The committed full-run artifact stays parseable and above the gate."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "eval_artifacts", "eval_report.json"
    )
    if not os.path.exists(path):
        pytest.skip("eval_artifacts not generated yet (scripts/run_eval.py)")
    with open(path) as f:
        report = json.load(f)
    assert report["num_families"] >= 10
    best = {}
    for col in (
        "centroid_estimator_turner", "centroid_estimator_contra",
        "threshold_estimator_turner", "threshold_estimator_contra",
    ):
        rows = report["curves"][col]
        assert len(rows) == 18
        # strict JSON: degenerate cells are null, not NaN
        vals = [
            (r["mcc"], r["f1"]) for r in rows
            if r["mcc"] is not None and r["f1"] is not None
        ]
        best[col] = (max(v[0] for v in vals), max(v[1] for v in vals))
        assert best[col][0] > 0.3, (col, best[col])
    # Regression floors (VERDICT round 2, item 8), pinned just below the
    # round-3 hard-family run (multiloop-dense / long-range / >=150nt /
    # pseudoknotted classes dropped best-F1 from ~0.82 to ~0.71-0.75, and
    # the greedy threshold arm became legitimately competitive with MEA on
    # these classes — so the gate pins absolute floors per column rather
    # than an arm ordering).  Committed run: centroid 0.726/0.707,
    # threshold 0.746/0.732 (turner/contra best F1).
    floors = {
        "centroid_estimator_turner": 0.68,
        "centroid_estimator_contra": 0.66,
        "threshold_estimator_turner": 0.68,
        "threshold_estimator_contra": 0.66,
    }
    for col, floor in floors.items():
        assert best[col][1] >= floor, (col, best[col], floor)
