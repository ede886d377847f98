"""Operator inventory from SURVEY.md section 2, one module per family.

Every public query function has signature fn(spark, sf_dir) -> DataFrame and
is registered (with its DuckDB oracle SQL, when SQL-expressible) in
kalytical_spark.registry.
"""
