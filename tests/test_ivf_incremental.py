"""Incremental IVF maintenance: boundary equivalence (incremental index ==
monolithic assignment under the frozen quantizer), recall floor, and cache
separation between the base-slice fit and the full-corpus fit."""

from __future__ import annotations

from pyspark.sql import functions as F

from kalytical_spark.operators.ivf_incremental import (
    IVF_DELTA_MOD,
    _maintained_index,
    sim_ivf_incremental,
    sim_ivf_incremental_recall_report,
)
from kalytical_spark.operators.kmeans_ivf import fit_kmeans_cells
from tests.conftest import SF_SMALL


def test_boundary_equivalence(spark):
    row = sim_ivf_incremental(spark, SF_SMALL).collect()[0]
    assert row.incremental_equals_batch
    assert row.indexed_total == row.n_base + row.n_delta
    assert row.n_delta > 0, "fixture must actually exercise a delta shard"


def test_recall_floor(spark):
    row = sim_ivf_incremental_recall_report(spark, SF_SMALL).collect()[0]
    assert row.recall_ok
    assert row.k_total == row.n_queries * 10


def test_base_fit_is_separate_from_full_fit(spark):
    """The stale (base-slice) quantizer must not alias the full-corpus fit:
    different cache keys, and the base fit indexes no delta vectors."""
    base_assign, _ = fit_kmeans_cells(spark, SF_SMALL, exclude_delta_mod=IVF_DELTA_MOD)
    full_assign, _ = fit_kmeans_cells(spark, SF_SMALL)
    n_delta_in_base = base_assign.filter(
        F.col("vec_id") % IVF_DELTA_MOD == 0
    ).count()
    assert n_delta_in_base == 0
    assert full_assign.count() > base_assign.count()
    maintained, _ = _maintained_index(spark, SF_SMALL)
    assert maintained.count() == full_assign.count()
