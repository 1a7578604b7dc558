"""Dump `.explain("formatted")` for catalog queries to files.

Usage: python tools/explain_dump.py OUT_DIR SUFFIX [sf_dir] query [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each query — the committed
before/after plan evidence for optimization rounds (plans/r15/...).
Run from the repo checkout whose plans you want (a worktree at the
baseline rev for `_before`, the working tree for `_after`).
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf_dir, names = rest[0], rest[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.1", rest

    sys.path.insert(0, os.getcwd())
    from id3c_spark.plans.queries import all_queries
    from id3c_spark.session import get_spark

    spark = get_spark("explain_dump")
    catalog = all_queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = catalog[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
