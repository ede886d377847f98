"""Focused experiment: decompose count:setsim_candidate_pairs at a scaled
textdedup point into (shingle build, banded-signature build, prefix window,
candidate join) legs. Usage: python tools/exp_setsim.py [k] [--mode=base|...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kalytical_spark import catalog  # noqa: E402
from kalytical_spark.session import get_spark, warm_python_workers  # noqa: E402


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = f"/tmp/kalytical_scale/textdedup_k{k}"
    assert os.path.isdir(sf_dir), sf_dir
    spark = get_spark("exp_setsim")
    catalog.register(spark, sf_dir)
    warm_python_workers(spark)

    from kalytical_spark.operators import dedup, setsim

    t0 = time.time()
    sh = dedup._shingles_df(spark, sf_dir).cache()
    n_sh = sh.count()
    t_sh = time.time() - t0
    print(f"LEG shingle_build      {t_sh:7.2f}s  rows={n_sh}", flush=True)

    t0 = time.time()
    long = dedup.banded_signatures(sh).cache()
    n_long = long.count()
    t_band = time.time() - t0
    print(f"LEG banded_build       {t_band:7.2f}s  rows={n_long}", flush=True)

    # seed BOTH memo layers so _prefix_candidates reuses this sh (it now
    # reads the shingle layer directly — seeding only _SIG_CACHE would
    # silently rebuild and double-cache the corpus shingles inside the
    # timed candidates leg)
    dedup._SH_CACHE[(dedup.app_key(spark), sf_dir)] = sh
    dedup._SIG_CACHE[(dedup.app_key(spark), sf_dir)] = (sh, long)

    t0 = time.time()
    n_cand = setsim._prefix_candidates(spark, sf_dir).count()
    t_cand = time.time() - t0
    print(f"LEG prefix_candidates  {t_cand:7.2f}s  rows={n_cand}", flush=True)
    print(
        f"TOTAL {t_sh + t_band + t_cand:7.2f}s "
        f"(sweep point charged all three; setsim needs sh + candidates only)"
    )


if __name__ == "__main__":
    main()
