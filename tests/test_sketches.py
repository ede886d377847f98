"""Semantic tests for the sketch family: HLL register/estimator behavior,
KMV estimator accuracy, and triangle-census orientation invariance. The
cross-engine value-hash proof lives in the oracle gate (tools/
check_oracle.py); these tests pin the *semantics* — estimator error
bounds, mergeability, determinism — that a hash match alone can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators import sketches
from tests.conftest import SF_ORACLE


def test_hll_registers_shape_and_bounds(spark):
    rows = sketches.sketch_hll_registers(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.bucket < sketches._HLL_M
        assert 1 <= r.r <= 121
    # registers are a pure function of the data: re-run is identical
    again = {(r.event_type, r.bucket, r.r) for r in sketches.sketch_hll_registers(spark, SF_ORACLE).collect()}
    assert {(r.event_type, r.bucket, r.r) for r in rows} == again


def test_hll_estimate_within_raw_hll_error(spark):
    rows = sketches.sketch_hll_estimate(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        est = r.est_milli / 1000.0
        # raw HLL (no small-range correction) at m=64 has ~1.04/sqrt(64)
        # = 13% std error, but low-cardinality groups bias high before the
        # linear-counting regime: accept a wide but non-vacuous band
        assert 0.3 * r.n_exact <= est <= 3.0 * r.n_exact, (r.event_type, est, r.n_exact)


def test_hll_registers_merge_equals_global(spark):
    """Mergeability — MAX-combining the per-type registers must equal the
    registers of the union: the property that lets 1000 executors sketch
    independently and combine 64 ints per group at the driver."""
    per_type = sketches.sketch_hll_registers(spark, SF_ORACLE)
    merged = {
        r.bucket: r.mr
        for r in per_type.groupBy("bucket").agg(F.max("r").alias("mr")).collect()
    }
    ev = sketches.t(spark, SF_ORACLE, "events_ms")
    glob = {
        r.bucket: r.r
        for r in ev.selectExpr(
            f"{sketches._hll_bucket_sql(sketches._H_USER)} AS bucket",
            f"{sketches._hll_rho_sql(sketches._H_USER)} AS rho",
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("r"))
        .collect()
    }
    assert merged == glob


def test_kmv_estimate_accuracy(spark):
    rows = sketches.sketch_kmv_distinct(spark, SF_ORACLE).collect()
    assert rows
    saw_sketched = False
    for r in rows:
        if r.n_exact < sketches._KMV_K:
            assert r.est == r.n_exact, "sub-k groups must report exactly"
        else:
            saw_sketched = True
            # KMV std error ~ 1/sqrt(k-2) = 12.7% at k=64; allow 4 sigma
            assert abs(r.est - r.n_exact) <= 0.51 * r.n_exact, (r.event_type, r.est, r.n_exact)
    assert saw_sketched, "fixture must exercise the estimator path"


def test_triangle_census_nonvacuous_and_consistent(spark):
    rows = sketches.graph_copurchase_triangles(spark, SF_ORACLE).collect()
    assert rows, "support-2 co-purchase graph must contain triangles"
    total_corners = sum(r.n_corners for r in rows)
    assert total_corners % 3 == 0, "every triangle has exactly 3 corners"
    assert total_corners >= 3
    for r in rows:
        assert 0 < r.n_parts <= r.n_corners
