"""Dump `.explain("formatted")` output for named registry queries to
plans/r11/<query>_<tag>.txt (the optimization-round evidence files).

Usage: python tools/dump_plan.py <before|after> name1 [name2 ...]
       python tools/dump_plan.py <before|after> memo:<memo_name>

Runs against $SPARK_GRAFT_SF_DIR (default sf0.1) with the same session
factory the bench uses, memo-warm (shared builds pre-paid) so the dumped
plan is the steady-state shape the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kalytical_spark import catalog  # noqa: E402
from kalytical_spark.registry import all_queries  # noqa: E402
from kalytical_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("kalytical_plans")
    catalog.register(spark, SF_DIR)
    queries = all_queries()

    import bench

    memos = dict(bench._memo_builders())
    # pre-pay shared memos so the dumped plan is the memo-warm shape
    for memo_name, build in memos.items():
        if any(n == memo_name for n in names):
            continue  # the target memo itself must stay cold to show its build plan
        out = build(spark, SF_DIR)
        if out is not None:
            out.count()

    for name in names:
        if name.startswith("memo:"):
            df = memos[name](spark, SF_DIR)
        else:
            fn, _oracle = queries[name]
            df = fn(spark, SF_DIR)
        if df is None:
            print(f"# {name}: eager build, no frame to explain", file=sys.stderr)
            continue
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        safe = name.replace(":", "_")
        path = os.path.join(OUT_DIR, f"{safe}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR} ({tag})\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
