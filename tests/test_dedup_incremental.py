"""Incremental delta dedup must find exactly the full mine's pairs that
touch the delta shard — nothing lost at the delta/base boundary, nothing
invented, and no base-base pair re-mined."""

from __future__ import annotations

from kalytical_spark.operators import dedup, dedup_incremental
from tests.conftest import SF_ORACLE


def test_delta_mine_equals_restricted_full_mine(spark):
    inc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_incremental.dedup_incremental_delta(
            spark, SF_ORACLE
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.dedup_minhash_lsh(spark, SF_ORACLE).collect()
    }
    m = dedup_incremental.DELTA_MOD
    expected = {
        k: v for k, v in full.items() if k[0] % m == 0 or k[1] % m == 0
    }
    assert inc == expected
    assert expected, "delta shard must touch at least one verified pair"
    # and the incremental result contains NO base-base pair
    assert all(a % m == 0 or b % m == 0 for a, b in inc)
