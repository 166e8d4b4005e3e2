from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from cqlcopy_spark.session import session_builder

    spark = (
        session_builder(app_name="cqlcopy_spark-tests", master="local[4]", shuffle_partitions=4)
        .getOrCreate()
    )
    yield spark
    spark.stop()
