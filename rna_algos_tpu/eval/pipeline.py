"""End-to-end accuracy-evaluation pipeline.

Re-creation of `/root/reference/scripts/run_ss_estimation_programs.py` +
`run_all.py`: run the centroid estimator over every compiled family for both
models and the full gamma grid, then aggregate PPV/sens/FPR/F1/MCC per gamma
(PR/ROC/F1/MCC curve data).  Results are written as JSON (plot-ready); the
wall time per model is reported like the reference's elapsed-time printouts
(run_ss_estimation_programs.py:70-86).
"""

import json
import math
import os
import time

from ..models.centroid import DEFAULT_GAMMAS
from ..utils import read_fasta
from ..utils.output import _fmt
from . import stats


PROGRAMS = ("centroid_estimator", "threshold_estimator")


def run_estimation(rna_dir, out_root, models=("turner", "contra"),
                   programs=PROGRAMS):
    """Fold every family once per model, write gamma-grid structure files.

    Layout mirrors the reference eval tree, one directory per (program,
    model) — the reference's second program column is the external
    CentroidFold tool (run_ss_estimation_programs.py:89-99); here it is the
    independent threshold estimator (eval/baseline.py):
    ``{out_root}/{program}_{model}/{family}/centroid_threshold={g}.fa``.
    BPPs are computed ONCE per (family, model) and shared by all programs,
    exactly like the reference reuses BPPs across its gamma grid.
    """
    from ..cli.centroid_fold import write_gamma_file
    from .baseline import write_gamma_file_threshold
    from ..parallel.runner import FoldEngine

    writers = {
        "centroid_estimator": write_gamma_file,
        "threshold_estimator": write_gamma_file_threshold,
    }
    timings = {}
    for model in models:
        engine = FoldEngine(uses_contra_model=(model == "contra"))
        fold_results = {}
        t0 = time.time()
        for fam_file in sorted(os.listdir(rna_dir)):
            if not fam_file.endswith(".fa"):
                continue
            fam = os.path.splitext(fam_file)[0]
            records = read_fasta(os.path.join(rna_dir, fam_file))
            folded = engine.fold_batch([r.seq for r in records])
            fold_results[fam] = [
                (bpp, presence, len(records[k].seq))
                for k, (bpp, presence) in enumerate(folded)
            ]
        fold_time = time.time() - t0
        for program in programs:
            t0 = time.time()
            for fam, results in fold_results.items():
                fam_dir = os.path.join(out_root, f"{program}_{model}", fam)
                os.makedirs(fam_dir, exist_ok=True)
                for gamma in DEFAULT_GAMMAS:
                    path = os.path.join(
                        fam_dir, f"centroid_threshold={_fmt(gamma)}.fa"
                    )
                    writers[program](path, results, gamma)
            timings[f"{program}_{model}"] = fold_time + (time.time() - t0)
    return timings


def compute_stats(out_root, rna_dir, ref_ss_dir, models=("turner", "contra"),
                  programs=PROGRAMS):
    """Aggregate accuracy curves (get_stats_of_ss_estimation_programs.py:46-111).

    One curve per (program, model) column, keyed "{program}_{model}" (the
    bare model name keys of round 1 map to the centroid_estimator columns
    and are kept as aliases for the plot/test surface)."""
    curves = {}
    for model in models:
        for program in programs:
            model_dir = os.path.join(out_root, f"{program}_{model}")
            if not os.path.isdir(model_dir):
                continue
            per_gamma = []
            for gamma in DEFAULT_GAMMAS:
                counts = []
                for fam_file in sorted(os.listdir(rna_dir)):
                    if not fam_file.endswith(".fa"):
                        continue
                    fam = os.path.splitext(fam_file)[0]
                    est_path = os.path.join(
                        model_dir, fam, f"centroid_threshold={_fmt(gamma)}.fa"
                    )
                    seq_lens = [
                        len(r.seq)
                        for r in read_fasta(os.path.join(rna_dir, fam_file))
                    ]
                    est = stats.read_sss(est_path)
                    ref = stats.read_sss(os.path.join(ref_ss_dir, fam_file))
                    counts.append(stats.pos_neg_counts(est, ref, seq_lens))
                tp, tn, fp, fn = stats.final_sum(counts)
                per_gamma.append(
                    {"gamma": gamma, **stats.summarize(tp, tn, fp, fn)}
                )
            curves[f"{program}_{model}"] = per_gamma
            if program == "centroid_estimator":
                curves[model] = per_gamma  # round-1 alias
    return curves


def _nan_to_null(obj):
    if isinstance(obj, float) and (math.isnan(obj) or math.isinf(obj)):
        return None
    if isinstance(obj, dict):
        return {k: _nan_to_null(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_nan_to_null(v) for v in obj]
    return obj


def run_all(sth_path, work_dir, models=("turner", "contra"),
            programs=PROGRAMS):
    """Full pipeline: compile families -> estimate -> stats (run_all.py:7-10)."""
    from .rfam import compile_rna_fams

    seq_dir = os.path.join(work_dir, "compiled_rna_fams")
    ss_dir = os.path.join(work_dir, "ref_sss")
    out_root = os.path.join(work_dir, "estimates")
    n_fams = compile_rna_fams(sth_path, seq_dir, ss_dir)
    timings = run_estimation(seq_dir, out_root, models, programs)
    curves = compute_stats(out_root, seq_dir, ss_dir, models, programs)
    report = {"num_families": n_fams, "timings_s": timings, "curves": curves}
    with open(os.path.join(work_dir, "eval_report.json"), "w") as f:
        # Strict JSON: degenerate (zero-denominator) metric cells are NaN
        # in-memory; serialize them as null (json.dump would emit the
        # Python-only literal `NaN`, which standards-compliant parsers
        # reject).
        json.dump(_nan_to_null(report), f, indent=2, allow_nan=False)
    try:
        from .plots import plot_curves

        column_keys = [f"{p}_{m}" for p in programs for m in models]
        report["figure"] = plot_curves(
            {k: curves[k] for k in column_keys if k in curves},
            os.path.join(work_dir, "fig_1.png"),
        )
    except ImportError:
        pass  # matplotlib absent: the JSON report is the artifact
    return report
