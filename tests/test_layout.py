"""Layout toolkit tests: bucketed joins must be shuffle-free; salted joins
must be result-identical to plain joins while spreading hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark import layout
from tests.conftest import SF_ORACLE, SF_SMALL


def _n_shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    return plan.count("Exchange hashpartitioning") + plan.count("Exchange rangepartitioning")


def test_bucketed_join_has_no_shuffle(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    layout.write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=4)
    layout.write_bucketed(orders, "orders_bucketed", "l_orderkey", n_buckets=4)
    joined = layout.bucketed_join(spark, "li_bucketed", "orders_bucketed", "l_orderkey")
    agg = joined.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    # join on the bucket key: no exchange for the join; the groupBy on the
    # same key also rides the bucketing -> zero shuffles end to end
    assert _n_shuffles(agg) == 0, agg._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == li.count()


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    plain = (
        li.join(orders, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    salted = (
        layout.salted_join(li, orders, "l_orderkey", n_salts=4)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert {(r.o_orderpriority, r.n) for r in plain} == {
        (r.o_orderpriority, r.n) for r in salted
    }


def test_salted_join_spreads_hot_key(spark):
    """A pathologically hot key must land in n_salts distinct salt groups."""
    hot = spark.range(0, 10000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 10).select(F.col("id").alias("k"), F.lit("x").alias("d"))
    out = layout.salted_join(hot, dim, "k", n_salts=8)
    assert out.count() == 10000
    salt = F.pmod(F.hash(F.struct(*[F.col(c) for c in hot.columns])), F.lit(8))
    n_groups = hot.withColumn("s", salt).select("s").distinct().count()
    assert n_groups == 8


def test_date_partitioned_events_prune(spark, tmp_path):
    """The event log's at-rest layout: date-partitioned parquet must show
    PartitionFilters in the scan (whole days skipped without reading files)."""
    from kalytical_spark import catalog
    import contextlib, io

    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events")
    out = str(tmp_path / "events_by_day")
    ev.withColumn("dt", F.to_date("event_time")).write.mode("overwrite").partitionBy(
        "dt"
    ).parquet(out)
    q = spark.read.parquet(out).filter(F.col("dt") == "2024-01-15")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "isnotnull(dt" in plan or "dt#" in plan.split("PartitionFilters")[1].splitlines()[0]
    # and the filter really prunes: only one partition's rows come back
    days = {r.dt for r in q.select("dt").distinct().collect()}
    assert days == {__import__("datetime").date(2024, 1, 15)}


def test_zorder_clusters_two_dimensions(spark, tmp_path):
    """Z-order layout proof: after write_zordered on (l_partkey,
    l_suppkey), the fraction of files whose min/max range overlaps a small
    2-D rectangle must be far below the single-column-sorted layout's — the
    file-stats pruning a reader gets on BOTH dimensions. Also: the layout
    must be a pure reshuffle (same rows, same schema)."""
    # sf0.01: 2000 partkeys x 100 suppkeys — enough cardinality that file
    # min/max stats are meaningful (sf0.001's 10 suppkeys are too coarse)
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    z_path = str(tmp_path / "li_z")
    s_path = str(tmp_path / "li_sorted")
    layout.write_zordered(li, z_path, "l_partkey", "l_suppkey", n_files=16)
    # baseline: range-sorted by partkey alone, same file count
    li.repartitionByRange(16, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(s_path)

    def overlap_fraction(path):
        df = spark.read.parquet(path)
        stats = (
            df.groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("l_partkey").alias("pmn"), F.max("l_partkey").alias("pmx"),
                F.min("l_suppkey").alias("smn"), F.max("l_suppkey").alias("smx"),
            )
            .collect()
        )
        # a small rectangle in both dimensions
        pk_hi = li.agg(F.max("l_partkey")).first()[0] // 4
        sk_hi = li.agg(F.max("l_suppkey")).first()[0] // 4
        hit = [r for r in stats if r.pmn <= pk_hi and r.smn <= sk_hi]
        return len(hit) / len(stats)

    fz, fs = overlap_fraction(z_path), overlap_fraction(s_path)
    assert spark.read.parquet(z_path).count() == li.count()
    assert sorted(spark.read.parquet(z_path).columns) == sorted(li.columns)
    # sorted-by-partkey layout: every file spans all suppkeys -> ~1/4 of
    # files hit on partkey but ALL of those hit on suppkey too; z-order
    # confines both dimensions
    assert fz < fs, (fz, fs)
    # measured: 2/16 files vs 4/16 for sorted; the bound leaves one file of
    # slack because repartitionByRange's boundary SAMPLING can shift file
    # edges between runs (observed flaking at 0.15 under concurrent load)
    assert fz <= 0.20, (fz, fs)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Join-driven pruning: when the partitioned fact joins a dim filtered
    on a NON-partition attribute, the fact scan must carry a dynamicpruning
    subquery in PartitionFilters — at 100 TB this skips whole days' files
    based on the broadcast dim result at runtime, which no static filter
    could express."""
    from kalytical_spark import catalog
    import contextlib, io

    catalog.register(spark, SF_SMALL)
    ev = spark.table("lifecycle_events")
    out = str(tmp_path / "events_by_day_dpp")
    ev.withColumn("dt", F.to_date("event_time")).write.mode("overwrite").partitionBy(
        "dt"
    ).parquet(out)
    fact = spark.read.parquet(out)
    # calendar dim: the is_audit_day flag is NOT derivable from dt statically
    days = fact.select("dt").distinct()
    dim = days.withColumn("is_audit_day", F.dayofmonth("dt") == 15)
    q = fact.join(dim.filter("is_audit_day"), "dt").groupBy("dt").count()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan, plan
    got = {r.dt.day for r in q.collect()}
    assert got == {15}
