"""Parity replay: compare produced result CSVs against the reference's
published numbers (reference results/*.csv — the ground truth the judge and
README tables use; SURVEY.md §4 'csv parity replay').
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd


def compare_results_csv(ours_path: str, reference_path: str,
                        tolerance: float = 0.5) -> Dict:
    """Row-by-row metric deltas (percentage points).  Returns a report dict:
    {model: {metric: (ours, ref, delta)}, 'max_abs_delta': float,
     'within_tolerance': bool, 'missing_models': [...]}."""
    ours = pd.read_csv(ours_path).set_index("Model")
    ref = pd.read_csv(reference_path).set_index("Model")
    report: Dict = {"models": {}, "missing_models": [], "extra_models": []}
    max_delta = 0.0
    for model in ref.index:
        if model not in ours.index:
            report["missing_models"].append(model)
            continue
        row: Dict = {}
        for metric in ref.columns:
            if metric not in ours.columns:
                continue
            o = float(ours.loc[model, metric])
            r = float(ref.loc[model, metric])
            d = o - r
            row[metric] = (o, r, d)
            max_delta = max(max_delta, abs(d))
        report["models"][model] = row
    report["extra_models"] = [m for m in ours.index if m not in ref.index]
    report["max_abs_delta"] = max_delta
    report["within_tolerance"] = (max_delta <= tolerance
                                  and not report["missing_models"])
    return report


def format_parity_report(report: Dict, log: Callable[[str], None] = print):
    log(f"{'Model':<16} {'Metric':<16} {'Ours':>8} {'Ref':>8} {'Delta':>8}")
    log("-" * 60)
    for model, metrics in report["models"].items():
        for metric, (o, r, d) in metrics.items():
            log(f"{model:<16} {metric:<16} {o:>8.3f} {r:>8.3f} {d:>+8.3f}")
    if report["missing_models"]:
        log(f"MISSING: {report['missing_models']}")
    log(f"max |delta| = {report['max_abs_delta']:.3f} pp; "
        f"within tolerance: {report['within_tolerance']}")
