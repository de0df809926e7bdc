"""DuckDB-oracle comparison harness (local mirror of the driver's t2 gate).

The reference has no golden-output corpus (SURVEY.md §5); its canonical
correctness artifacts are TPC-H Q1/Q12 plan tests. Our analogue, per
BASELINE.md, is value-level comparison against DuckDB on the synthetic
tables. This module mimics the driver: row count, column names, and an
order-insensitive value comparison (exact after canonicalization — queries
are written to be deterministic, with explicit rounding on
order-of-accumulation-sensitive float aggregates).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # normalize -0.0
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    def __str__(self) -> str:
        s = "OK " if self.ok else "FAIL"
        return f"[{s}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows} {self.detail}"


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str | None,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    if oracle_sql is None:
        return CompareResult(name, len(s_rows) >= 0, len(s_rows), -1, "rows-only")
    o_rel = con.sql(oracle_sql)
    o_cols = list(o_rel.columns)
    o_rows = [tuple(r) for r in o_rel.fetchall()]
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in o_cols):
        return CompareResult(
            name, False, len(s_rows), len(o_rows), f"schema: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        )
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")
    sc = _canon_rows([c.lower() for c in s_cols], s_rows)
    oc = _canon_rows([c.lower() for c in o_cols], o_rows)
    if sc != oc:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(sc, oc)) if a != b)
        return CompareResult(
            name, False, len(s_rows), len(o_rows), f"value mismatch at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}"
        )
    return CompareResult(name, True, len(s_rows), len(o_rows))
