"""Leg decomposition of memo:setsim_pairs at $SPARK_GRAFT_SF_DIR (r12):
times the candidate build and the verify separately, memo-warm shingles
(the bench builds memo:lsh_signatures before memo:setsim_pairs, so the
memo line's real content is candidates + verify).

Usage: python tools/exp_setsim_sf.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kalytical_spark import catalog  # noqa: E402
from kalytical_spark.session import get_spark, warm_python_workers  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("exp_setsim_sf")
    catalog.register(spark, SF_DIR)
    warm_python_workers(spark)

    from kalytical_spark.operators import dedup, setsim

    t0 = time.time()
    sh, long = dedup.signature_tables(spark, SF_DIR)
    long.count()
    print(f"LEG shingle+banded     {time.time() - t0:7.2f}s", flush=True)

    for rnd in range(2):
        t0 = time.time()
        cand = setsim._prefix_candidates(spark, SF_DIR).cache()
        n_cand = cand.count()
        t_cand = time.time() - t0

        t0 = time.time()
        result = setsim.setsim_pairs_plan(spark, SF_DIR, cand).cache()
        n_pairs = result.count()
        t_ver = time.time() - t0
        cand.unpersist()
        result.unpersist()
        print(
            f"round{rnd}: candidates {t_cand:6.2f}s rows={n_cand}  "
            f"verify {t_ver:6.2f}s pairs={n_pairs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
