"""Summarize repeated bench.py runs against a previous round's bench.

Usage: python tools/bench_deltas.py RUNS.jsonl BASELINE.json OUT.json [NOTES.json]

RUNS.jsonl = one bench.py JSON line per run (n >= 1). Writes per-query
medians, the baseline comparison on the common query set, and the
biggest movers — the committed evidence for per-round perf drift.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    runs_path, base_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    runs = [json.loads(line) for line in open(runs_path) if line.strip()]
    base = json.load(open(base_path))
    base_q = base.get("parsed", base).get("queries", base.get("queries"))

    med = {
        q: round(statistics.median(r["queries"][q] for r in runs), 3)
        for q in runs[0]["queries"]
    }
    common = sorted(set(med) & set(base_q))
    tot_now = sum(med[q] for q in common)
    tot_base = sum(base_q[q] for q in common)
    deltas = sorted(
        (
            {
                "query": q,
                "baseline_sec": round(base_q[q], 3),
                "median_sec": med[q],
                "ratio": round(med[q] / base_q[q], 2),
            }
            for q in common
        ),
        key=lambda d: -d["ratio"],
    )
    notes_path = sys.argv[4] if len(sys.argv) > 4 else None
    out = {
        "n_runs": len(runs),
        "sf": runs[0].get("sf"),
        **({"notes": json.load(open(notes_path))} if notes_path else {}),
        "catalog_total_median_sec": round(
            statistics.median(r["value"] for r in runs), 3
        ),
        "common_set": {
            "n_queries": len(common),
            "total_now_sec": round(tot_now, 3),
            "total_baseline_sec": round(tot_base, 3),
            "ratio": round(tot_now / tot_base, 3),
        },
        "median_queries": med,
        "deltas_vs_baseline": deltas,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(
        f"common-{len(common)}: {tot_now:.1f}s vs baseline {tot_base:.1f}s "
        f"= {tot_now / tot_base:.2f}x → wrote {out_path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
