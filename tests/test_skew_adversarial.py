"""Adversarial skew plants for the pruning joins (VERDICT r6 task 4): the
benign near-uniform fixtures prove correctness; these fixtures plant the
pathological hot keys a real crawl produces and pin candidate-mass upper
bounds, so a regression that lets candidate generation go quadratic under
a hot key FAILS loudly instead of surfacing as an OOM at scale.

Plants (scratch corpora derived from sf0.001, base tables symlinked):
* a stopword-like token sequence appended to 30% of documents — one
  shingle shared by 150 docs, naive candidate mass C(150,2) = 11,175
  pairs from that single posting list;
* one 500-item basket — C(500,2) = 124,750 pair instances from ONE
  order under uncapped expansion.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from kalytical_spark.operators import basket, dedup, setsim
from tests.conftest import SF_SMALL

SCRATCH = "/tmp/kalytical_skew"
N_HOT_DOCS = 150  # 30% of the 500-doc sf0.001 corpus


def _scratch_dir(name: str, override_table: str) -> str:
    out = os.path.join(SCRATCH, name)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(SF_SMALL):
        if f != override_table:
            os.symlink(os.path.join(SF_SMALL, f), os.path.join(out, f))
    return out


@pytest.fixture(scope="module")
def hot_docs_dir(spark) -> str:
    """sf0.001 with ' hot hot hot hot hot' appended to 30% of documents:
    every hot doc shares the ('hot','hot','hot') shingle."""
    out = _scratch_dir("docs_hot", "documents.parquet")
    docs = spark.read.parquet(os.path.join(SF_SMALL, "documents.parquet"))
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(F.col("text"), F.lit(" hot hot hot hot hot")),
        ).otherwise(F.col("text")),
    ).withColumn("n_chars", F.length("text").cast("long"))
    planted.coalesce(1).write.parquet(os.path.join(out, "documents.parquet"))
    return out


@pytest.fixture(scope="module")
def hot_basket_dir(spark) -> str:
    """sf0.001 with ONE planted 500-part order appended to lineitem."""
    out = _scratch_dir("basket_hot", "lineitem.parquet")
    li = spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet"))
    one = li.limit(1).drop("l_orderkey", "l_partkey")
    mega = (
        spark.range(1, 501)
        .select(
            F.lit(999_999_999).alias("l_orderkey"),
            F.col("id").cast(dict(li.dtypes)["l_partkey"]).alias("l_partkey"),
        )
        .crossJoin(F.broadcast(one))
        .select(*li.columns)
    )
    li.unionByName(mega).coalesce(1).write.parquet(
        os.path.join(out, "lineitem.parquet")
    )
    return out


def test_setsim_hot_shingle_stays_subquadratic(spark, hot_docs_dir):
    """The rarest-first prefix filter must exclude the hot shingle from
    candidate generation: measured plant cost is +1 candidate pair (the
    bound leaves slack at +50) against a naive +11,175."""
    base = setsim._prefix_candidates(spark, SF_SMALL).count()
    planted = setsim._prefix_candidates(spark, hot_docs_dir).count()
    naive_extra = N_HOT_DOCS * (N_HOT_DOCS - 1) // 2
    assert planted - base <= 50, (
        f"hot shingle added {planted - base} candidates "
        f"(naive quadratic mass would be {naive_extra})"
    )


def test_lsh_band_buckets_stay_bounded_under_hot_token(spark, hot_docs_dir):
    """A 30%-common token must not concentrate minhash band buckets:
    bucket membership bounds the banding join's per-key fan-out."""
    _sh, long = dedup.signature_tables(spark, hot_docs_dir)
    max_bucket = (
        long.groupBy("band_idx", "band_key")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket <= 8, f"hot band bucket of {max_bucket} docs"


def test_basket_cap_excludes_degenerate_order(spark, hot_basket_dir):
    """The 500-item basket is excluded wholesale (cap MAX_BASKET_ITEMS):
    rules over the planted corpus are IDENTICAL to the unplanted ones —
    not just bounded, unchanged — because the degenerate order leaves
    n_orders, supports, and pairs untouched."""
    base_rules = basket.orders_market_basket(spark, SF_SMALL).collect()
    planted_rules = basket.orders_market_basket(spark, hot_basket_dir).collect()
    assert planted_rules == base_rules
    # the plant is real: uncapped expansion over the planted corpus WOULD
    # see the mega-basket
    li = spark.read.parquet(os.path.join(hot_basket_dir, "lineitem.parquet"))
    mega_n = (
        li.filter(F.col("l_orderkey") == 999_999_999)
        .select("l_partkey")
        .distinct()
        .count()
    )
    assert mega_n == 500 and mega_n > basket.MAX_BASKET_ITEMS
