"""tools/control_run.py band math — now load-bearing perf evidence
(CONTROL_r13.json): the converged band takes the LAST max(3, reps//2)
reps, and per-pass ratios are computed pass-by-pass so a one-segment
regime swing cannot silently bias a pooled median."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "control_run",
    os.path.join(os.path.dirname(__file__), "..", "tools", "control_run.py"),
)
control_run = importlib.util.module_from_spec(spec)
spec.loader.exec_module(control_run)


def test_band_takes_tail_reps():
    # 6 reps: band = last max(3, 3) = 3 reps; early cold reps excluded
    b = control_run._band([10.0, 5.0, 4.0, 4.2, 4.0, 4.4], 6)
    assert b["converged_median"] == 4.2
    assert b["converged_min"] == 4.0
    assert b["reps"][0] == 10.0  # raw reps preserved for the artifact


def test_band_short_lists_use_all():
    b = control_run._band([2.0, 1.0], 2)  # max(3, 1) = 3 > len → all
    assert b["converged_median"] == 1.5
    assert b["converged_min"] == 1.0


def test_band_concatenated_passes_tail_is_last_pass():
    # two 6-rep passes concatenated: tail 6 = exactly pass 2 — the
    # property that made invocation 1's pooled ratio regime-sensitive
    # and motivated per-pass reporting
    xs = [4.0] * 6 + [6.0] * 6
    b = control_run._band(xs, 12)
    assert b["converged_median"] == 6.0
