"""Every registry query must hash-match its DuckDB oracle — this mirrors the
driver's CORRECTNESS gate (row count + schema + order-insensitive values)."""

from __future__ import annotations

import pytest

from nzgmdb_spark.oracle import check_query
from nzgmdb_spark.queries import load_registry
from tests.conftest import SF_MEDIUM


def _names():
    return sorted(load_registry().keys())


@pytest.mark.parametrize("name", _names())
def test_parity(spark, name):
    # sf0.01 is the driver's correctness-gate scale — test at the same one.
    issues = check_query(name, SF_MEDIUM, spark)
    assert not issues, f"{name}: " + "; ".join(issues)
