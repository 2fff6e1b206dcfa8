from __future__ import annotations

import pytest

from kafka_backup_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kbs-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
