from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ballista_mvp_spark.oracle import duckdb_connect  # noqa: E402
from ballista_mvp_spark.session import build_session  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MID = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = build_session("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck_small():
    return duckdb_connect(SF_SMALL)


@pytest.fixture(scope="session")
def duck_mid():
    return duckdb_connect(SF_MID)
