"""Forensics for the docs-chain `memo:lsh_signatures` k100 leg (VERDICT r7
task 3: 17.9 -> 61.2 s for 3.3x data, k30 -> k100, cause unproven).

The memo is two cached builds; this tool times them separately per scale
point, each in a FRESH JVM (the spans-leg lesson: shared sessions charge
heap garbage from smaller points to the big one), with the app-status
spill/shuffle deltas per stage:

  stage A  sh    docs scan -> repartition(doc_id) -> 3-gram explode ->
                 distinct -> cache+count        (shuffle = the repartition)
  stage B  long  16 md5-slice projections -> groupBy(doc_id) min-fold ->
                 band md5 -> stack -> cache+count  (pre-aligned: no shuffle)

Candidate causes it separates:
  * explode width (stage A wall tracks shingle rows superlinearly),
  * hash-agg or cache spill (nonzero spill columns),
  * CPU in the md5 slice fold (stage B wall, zero spill, linear rows),
  * residual cold start (neither stage reproduces the sweep number).

Usage: python tools/diag_lsh_signatures.py [k1,k2,...]   (default 10,30,100)
Single-point mode (fresh JVM per point): --single <k>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_single(k: int) -> None:
    from kalytical_spark import catalog
    from kalytical_spark.operators.dedup import _shingles_df, banded_signatures
    from kalytical_spark.session import get_spark, warm_python_workers
    from tools.scale_bench import _exec_metrics, build_scaled_dir

    spark = get_spark("diag_lsh_signatures")
    sf_dir = build_scaled_dir(spark, "docs", k)
    catalog.register(spark, sf_dir)
    warm_python_workers(spark)

    out: dict = {"k": k}
    m0, d0, s0 = _exec_metrics(spark)
    t0 = time.time()
    sh = _shingles_df(spark, sf_dir).cache()
    out["sh_rows"] = sh.count()
    out["t_shingles_sec"] = round(time.time() - t0, 2)
    m1, d1, s1 = _exec_metrics(spark)
    out["sh_spill_mb"] = round((m1 - m0) / 1e6, 1)
    out["sh_disk_spill_mb"] = round((d1 - d0) / 1e6, 1)
    out["sh_shuffle_mb"] = round((s1 - s0) / 1e6, 1)

    t0 = time.time()
    long = banded_signatures(sh).cache()
    out["long_rows"] = long.count()
    out["t_banded_sec"] = round(time.time() - t0, 2)
    m2, d2, s2 = _exec_metrics(spark)
    out["long_spill_mb"] = round((m2 - m1) / 1e6, 1)
    out["long_disk_spill_mb"] = round((d2 - d1) / 1e6, 1)
    out["long_shuffle_mb"] = round((s2 - s1) / 1e6, 1)
    print("RESULT" + json.dumps(out))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--single":
        run_single(int(sys.argv[2]))
        return
    ks = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "10,30,100").split(",")]
    for k in ks:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single", str(k)],
            capture_output=True, text=True, timeout=1800,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line[len("RESULT"):])
                break
        else:
            print(f"# k={k} produced no RESULT; stderr tail: "
                  f"{proc.stderr[-500:]}", file=sys.stderr)


if __name__ == "__main__":
    main()
