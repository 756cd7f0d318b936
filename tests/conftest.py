from __future__ import annotations

import pytest

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from nzgmdb_spark.session import get_spark

    s = get_spark(app_name="nzgmdb-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
