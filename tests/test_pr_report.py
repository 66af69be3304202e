"""Gate BASELINE.md's P/R >= 0.95 metric: per-edge-family precision and
recall of the kernel against the frozen edge-level goldens
(tests/golden_edges.json; provenance documented in scripts/pr_report.py
and PARITY.md). Counts alone can mask compensating add/drop errors —
edge-identity multiset intersection cannot."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "pr_report",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "pr_report.py"))
pr_report = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pr_report)


def test_pr_at_least_095_per_family():
    report = pr_report.compute(write_md=False)
    assert report, "no families measured"
    for fam, row in report.items():
        assert row["precision"] >= 0.95, (fam, row)
        assert row["recall"] >= 0.95, (fam, row)


def test_all_families_present():
    report = pr_report.compute(write_md=False)
    # cfg_jump / pdg_control_false need break/else shapes — present in the
    # fixture corpus; every family the kernel emits must be measured
    assert set(report) == {"ast_child", "cfg_normal", "cfg_true",
                           "cfg_false", "pdg_control_true",
                           "pdg_control_false", "pdg_data", "pdg_execution"}
