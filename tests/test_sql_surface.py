"""The engine's SQL surface must agree with its DataFrame programs.

Every registry oracle is ANSI SQL written for DuckDB; the subset that also
parses in Spark's dialect is executed through ``nzgmdb_spark.sql.run_sql``
and compared row-for-row against the hand-built DataFrame plan. This is a
three-way consistency check (DataFrame ≡ Spark SQL ≡ DuckDB) on the shared
dialect, and it pins the size of that shared dialect so a refactor that
silently breaks SQL-surface compatibility fails here.
"""

from __future__ import annotations

import pytest
from pyspark.errors.exceptions.captured import (
    AnalysisException,
    ParseException,
)

from nzgmdb_spark.oracle import compare
from nzgmdb_spark.queries import load_registry
from nzgmdb_spark.sql import run_sql
from tests.conftest import SF_SMALL


def _sql_specs():
    return sorted(
        (n, s.sql) for n, s in load_registry().items() if s.sql is not None
    )


def test_sql_surface_parity(spark):
    from pyspark.sql import functions as F

    ran, skipped, failures = [], [], []
    for name, sql in _sql_specs():
        try:
            sql_df = run_sql(spark, SF_SMALL, sql)
        except (AnalysisException, ParseException):
            # DuckDB-only construct (string_split, UNNEST lateral, hex
            # casts, recursive CTE, ...) — not part of the shared dialect.
            skipped.append(name)
            continue
        df = load_registry()[name].fn(spark, SF_SMALL)
        # Spark parses `1000.0` literals as DECIMAL where DuckDB promotes
        # mixed arithmetic to DOUBLE, so a few oracles surface decimal
        # columns here; align to the DataFrame program's declared schema
        # (values are still compared exactly).
        types = {f.name: f.dataType for f in df.schema.fields}
        sql_pdf = sql_df.select(
            *[F.col(c).cast(types[c]) if c in types else F.col(c)
              for c in sql_df.columns]
        ).toPandas()
        df_pdf = df.toPandas()
        issues = compare(df_pdf, sql_pdf)
        if issues:
            failures.append(f"{name}: " + "; ".join(issues))
        else:
            ran.append(name)
    assert not failures, "\n".join(failures)
    # The shared dialect must not silently shrink: every pure-ANSI oracle
    # (all the TPC-H shapes among them) runs on Spark SQL verbatim.
    assert len(ran) >= 40, (
        f"only {len(ran)} oracles ran through Spark SQL "
        f"(skipped {len(skipped)}: {skipped[:10]}...)"
    )
