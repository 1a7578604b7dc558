"""Side-runner for tools/control_run.py: run N warm reps of the named
catalog queries inside ONE Spark session rooted at --root (a checked-out
repo or worktree), with bench.py's exact warm-up (JVM/codegen pass,
Python/Arrow worker pool, persisted ANN index cache), and print one JSON
line per (rep, query) plus a final summary line.

Version-independent by design: this file ships with the CURRENT repo but
imports `id3c_spark` from --root, so the same runner drives any prior
round's HEAD. Invoke:

    python tools/_control_runner.py --root /tmp/ctrl_x --sf /root/testdata/sf0.1 \
        --reps 6 --queries a,b,c
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--queries", required=True)
    args = ap.parse_args()

    root = os.path.abspath(args.root)
    os.chdir(root)
    sys.path.insert(0, root)

    from id3c_spark.plans.queries import all_queries  # noqa: E402  (side import)
    from id3c_spark.session import get_spark  # noqa: E402

    names = [n for n in args.queries.split(",") if n]
    spark = get_spark("control_run")
    catalog = all_queries()
    missing = [n for n in names if n not in catalog]
    if missing:
        print(json.dumps({"error": f"unknown queries in this rev: {missing}"}))
        return 2

    # bench.py's warm-up, verbatim in spirit: JVM/codegen, the
    # Python/Arrow worker pool, and the persisted ANN index cache (a
    # build charged to whichever query runs first is not a serving
    # number).
    catalog["pricing_summary"](spark, args.sf).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    try:
        from id3c_spark.plans.ann_index import cached_index

        cached_index(
            spark, f"{args.sf}/embeddings.parquet",
            nlist=8, m=16, kcent=256, train_iter=2, assign_n=2,
        )
        try:
            cached_index(
                spark, f"{args.sf}/embeddings.parquet",
                nlist=8, m=16, kcent=256, train_iter=2, assign_n=2,
                assign_ratio=1.04,
            )
        except TypeError:
            pass  # rev predates adaptive multi-assign
    except Exception:
        pass  # missing table / rev predates the index — inline fallback
    spark.catalog.clearCache()

    reps: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            t0 = time.perf_counter()
            catalog[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            reps[name].append(dt)
            spark.catalog.clearCache()
            print(json.dumps({"rep": rep, "query": name, "sec": dt}),
                  flush=True)
    print(json.dumps({"summary": reps}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
