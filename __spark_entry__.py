"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1, the reference's own
smoke query — reference README.md:42-50) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the certified operator inventory from SURVEY.md §2
(registry: ballista_mvp_spark/queries/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ballista_mvp_spark.queries import ALL_ORACLES, ALL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return ALL_QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here get the driver's
    weaker rows-only check (nondeterministic/approx/Python-only ops)."""
    return dict(ALL_ORACLES)
