"""Measurement probe for optimization work (guide §1): run an arbitrary
subset of registry queries in ONE session and print PER-RUN times (bench.py
reports only the warm median, which hides run-to-run drift — the r11
suite showed warm medians ABOVE cold first runs for some queries, i.e.
re-running the same query got slower inside one session).

Usage:
    python tools/bench_probe.py q1,q2,...      # 3 runs each, per-run times
    SPARK_GRAFT_PROBE_RUNS=5 python tools/bench_probe.py q1
    SPARK_GRAFT_PROBE_CONF="spark.foo=bar;spark.baz=qux" ...  # extra confs
    SPARK_GRAFT_PROBE_MEMOS=1 ...              # prepay the shared memos

Prints one line per query: name, runs, and (min/median) summaries, plus a
total. Never writes BENCH_FULL.json.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "3"))


def main() -> None:
    names_arg = sys.argv[1] if len(sys.argv) > 1 else ""
    extra = os.environ.get("SPARK_GRAFT_PROBE_CONF", "")

    from kalytical_spark import catalog
    from kalytical_spark.registry import all_queries
    from kalytical_spark.session import get_spark, warm_python_workers

    if extra:
        # static confs must reach the JVM before it starts: pass them via
        # PYSPARK_SUBMIT_ARGS, which the first builder.getOrCreate() honors
        pairs = [kv for kv in extra.split(";") if "=" in kv]
        flags = " ".join(f"--conf {kv}" for kv in pairs)
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"{flags} pyspark-shell"
    spark = get_spark("kalytical_probe")

    catalog.register(spark, SF_DIR)
    spark.table("lifecycle_events").count()
    spark.table("incubating_triggers").count()
    warm_python_workers(spark)

    queries = all_queries()
    names = [n for n in names_arg.split(",") if n in queries]
    missing = [n for n in names_arg.split(",") if n and n not in queries]
    if missing:
        print(f"# unknown queries skipped: {missing}", file=sys.stderr)

    if os.environ.get("SPARK_GRAFT_PROBE_MEMOS") == "1":
        import bench

        for memo_name, build in bench._memo_builders():
            t0 = time.time()
            out = build(spark, SF_DIR)
            if out is not None:
                out.count()
            print(f"memo {memo_name:34s} {time.time() - t0:6.2f}s", flush=True)

    total_med = 0.0
    for name in names:
        fn, _oracle = queries[name]
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        med = sorted(runs)[len(runs) // 2]
        total_med += med
        print(
            f"{name:40s} med={med:6.2f}  runs=["
            + ", ".join(f"{r:.2f}" for r in runs)
            + "]",
            flush=True,
        )
    print(f"TOTAL(median) {total_med:.2f}s over {len(names)} queries")


if __name__ == "__main__":
    main()
