from __future__ import annotations

import pytest

from refimage_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("refimage-spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")
