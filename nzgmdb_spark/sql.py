"""Spark SQL surface over the warehouse.

The reference has no query language — every "query" is a hard-coded pandas
program (SURVEY.md §3). This engine's DataFrame programs compile to the
same Catalyst plans as Spark SQL, so exposing the warehouse through temp
views gives users a real SQL entry point for free: ANSI-SQL text → Catalyst
→ the same optimized physical plans the registry queries produce.

``tests/test_sql_surface.py`` keeps this honest: every registry oracle
string that parses in Spark's dialect is executed through ``run_sql`` and
must produce exactly the same rows as the hand-built DataFrame program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nzgmdb_spark.tables import TABLE_NAMES, tbl


def create_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every warehouse table as a temp view (idempotent).

    Views go through :func:`nzgmdb_spark.tables.tbl`, so schema
    normalization (the events ``ts`` timestamp handling) applies to SQL
    users identically to DataFrame users.
    """
    for name in TABLE_NAMES:
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Run a SQL query against the warehouse views."""
    create_views(spark, sf_dir)
    return spark.sql(sql)
