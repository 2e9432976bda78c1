from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from occupation_wage_etl_spark.session import get_spark

    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = get_spark(
        "tests",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.warehouse.dir": str(wh),
        },
    )
    yield s
    s.stop()


SF_DIRS = {
    "tiny": "/root/testdata/sf0.001",
    "small": "/root/testdata/sf0.01",
}


@pytest.fixture(scope="session")
def sf_tiny() -> str:
    return SF_DIRS["tiny"]


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_DIRS["small"]
