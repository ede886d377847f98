"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in kalytical_spark/ (see SURVEY.md for the operator
inventory this covers). Oracle SQL strings embed the shared fixture
WITH-block from kalytical_spark/domain.py, so DuckDB derives the identical
kalytical-domain tables from the pre-registered parquet views.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kalytical_spark import registry  # noqa: E402
from kalytical_spark.operators.dag import dag_fire_decisions  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: batch DAG resolution — success lifecycle
    events resolved through the dependency adjacency into fire-vs-incubate
    dispatch decisions (reference dispatcher.py:31-46 semantics)."""
    return dag_fire_decisions(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _oracle) in registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: oracle
        for name, (_fn, oracle) in registry.all_queries().items()
        if oracle is not None
    }
