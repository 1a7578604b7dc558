"""Same-machine control-run harness — the r(N-1)-HEAD methodology that
re-baselined curation in r12 (CURATION_FLOOR_r12.md), institutionalized
(r12 verdict task #4).

Given a control git rev and a query list, check the rev out into a
temporary worktree, run N warm reps of each query against BOTH the
control rev and the current repo HEAD back-to-back on THIS machine
(regime-matched: one tool invocation, sides run serially within minutes
of each other), and emit the rep tables + converged bands + ratios as
JSON (and optionally a markdown floor table).

The converged band is the median and min of the LAST max(3, reps//2)
reps per query — many-stage queries need ~4 reps of JIT before the
floor appears, so early reps are reported but excluded from the band.

Usage:
    python tools/control_run.py --rev <control-rev> \
        --queries ivfpq_rerank_topk_embeddings,ivfpq_topk_embeddings \
        --reps 6 [--sf /root/testdata/sf0.1] \
        [--out-json CONTROL_r13.json] [--out-md IVFPQ_FLOOR_r13.md] \
        [--passes 1]

Interpretation contract (from the accepted r12 re-baseline): the bar is
RELATIVE — current HEAD's converged floor must not exceed the control
rev's converged floor by >15% on the same VM; absolute per-round medians
do not transfer across driver VMs (kernel fixed costs differ 1.15-2.2x
round to round).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_side(root: str, sf: str, reps: int, queries: list[str]) -> dict:
    """One side (repo root) → {query: [sec per rep]} via the
    version-independent runner subprocess."""
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "_control_runner.py"),
        "--root", root, "--sf", sf, "--reps", str(reps),
        "--queries", ",".join(queries),
    ]
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the runner pins sys.path to --root
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    summary = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "error" in obj:
            raise SystemExit(f"runner error ({root}): {obj['error']}")
        if "summary" in obj:
            summary = obj["summary"]
        else:
            print(f"  [{os.path.basename(root)}] rep {obj['rep']} "
                  f"{obj['query']}: {obj['sec']}s", flush=True)
    if summary is None:
        sys.stderr.write(proc.stdout[-2000:] + "\n" + proc.stderr[-4000:])
        raise SystemExit(f"runner produced no summary for {root}")
    return summary


def _band(xs: list[float], reps: int) -> dict:
    tail = xs[-max(3, reps // 2):]
    return {
        "reps": xs,
        "converged_median": round(statistics.median(tail), 3),
        "converged_min": round(min(tail), 3),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", required=True, help="control git rev")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--passes", type=int, default=1,
                    help="repeat the control/current pair (drift check)")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out-json", default=None)
    ap.add_argument("--out-md", default=None)
    args = ap.parse_args()
    queries = [q for q in args.queries.split(",") if q]

    sha = subprocess.run(
        ["git", "rev-parse", args.rev], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = f"/tmp/ctrl_{sha[:10]}"
    if not os.path.isdir(wt):
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO, check=True,
        )
    kernel = os.uname().release

    sides: dict[str, list[dict]] = {"control": [], "current": []}
    for p in range(args.passes):
        print(f"pass {p + 1}/{args.passes}: control rev {sha[:10]}",
              flush=True)
        sides["control"].append(_run_side(wt, args.sf, args.reps, queries))
        print(f"pass {p + 1}/{args.passes}: current HEAD "
              f"{head[:10]} (+ working tree)", flush=True)
        sides["current"].append(_run_side(REPO, args.sf, args.reps, queries))

    result = {
        "meta": {
            "kernel": kernel,
            "control_rev": sha,
            "current_head": head,
            "sf_dir": args.sf,
            "reps": args.reps,
            "passes": args.passes,
            "method": "back-to-back same-VM warm reps, one session per "
                      "side per pass; band = median/min of the last "
                      f"max(3, reps//2) reps (CURATION_FLOOR_r12 "
                      "methodology)",
        },
        "queries": {},
    }
    for q in queries:
        ctrl = _band([x for s in sides["control"] for x in s[q]], args.reps)
        curr = _band([x for s in sides["current"] for x in s[q]], args.reps)
        # per-pass bands + ratios: each control/current pass pair ran
        # back-to-back, so the per-pass ratio is the drift-robust
        # statistic — a noisy-neighbor swing that lands on ONE segment
        # shows up as pass disagreement instead of silently biasing a
        # concatenated band (exactly what r12's 223-322 s same-code
        # swings would do to a single pooled median)
        per_pass = []
        for p in range(args.passes):
            cb = _band(sides["control"][p][q], args.reps)
            xb = _band(sides["current"][p][q], args.reps)
            per_pass.append({
                "control": cb,
                "current": xb,
                "ratio_converged_median": round(
                    xb["converged_median"] / cb["converged_median"], 3
                ) if cb["converged_median"] else None,
            })
        ratios = [p["ratio_converged_median"] for p in per_pass
                  if p["ratio_converged_median"] is not None]
        result["queries"][q] = {
            "control": ctrl,
            "current": curr,
            "ratio_converged_median": round(
                curr["converged_median"] / ctrl["converged_median"], 3
            ) if ctrl["converged_median"] else None,
            "ratio_converged_min": round(
                curr["converged_min"] / ctrl["converged_min"], 3
            ) if ctrl["converged_min"] else None,
            "per_pass": per_pass,
            "best_pass_ratio": min(ratios) if ratios else None,
            "worst_pass_ratio": max(ratios) if ratios else None,
        }

    out = json.dumps(result, indent=2)
    if args.out_json:
        with open(os.path.join(REPO, args.out_json), "w") as f:
            f.write(out + "\n")
        print(f"wrote {args.out_json}")
    else:
        print(out)

    if args.out_md:
        lines = [
            f"# Same-machine control run — {os.path.basename(args.out_md)}",
            "",
            f"Kernel `{kernel}`; control rev `{sha[:10]}` vs current HEAD "
            f"`{head[:10]}` (plus working tree); {args.reps} warm reps x "
            f"{args.passes} pass(es) per side, back-to-back in one tool "
            f"invocation at `{args.sf}`. Band = median/min of the last "
            "max(3, reps//2) reps. Relative bar (accepted r12 contract): "
            "current converged median <= 1.15x control on the same VM.",
            "",
            "| query | control reps (s) | current reps (s) | control med/min | current med/min | ratio (med) | per-pass ratios |",
            "|---|---|---|---|---|---|---|",
        ]
        for q, r in result["queries"].items():
            cr = ", ".join(f"{x:.2f}" for x in r["control"]["reps"])
            xr = ", ".join(f"{x:.2f}" for x in r["current"]["reps"])
            pp = ", ".join(str(p["ratio_converged_median"])
                           for p in r["per_pass"])
            lines.append(
                f"| {q} | {cr} | {xr} | "
                f"{r['control']['converged_median']}/{r['control']['converged_min']} | "
                f"{r['current']['converged_median']}/{r['current']['converged_min']} | "
                f"{r['ratio_converged_median']} | {pp} |"
            )
        with open(os.path.join(REPO, args.out_md), "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.out_md}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
