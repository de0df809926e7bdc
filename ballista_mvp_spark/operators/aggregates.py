"""Aggregate parity helpers — SURVEY.md §2.5.

Spark covers 18 of the reference's 19 aggregate functions natively
(reference enum: ballista/core/proto/datafusion.proto:529-549; mapping
table SURVEY.md §2.5). The gap is
APPROX_PERCENTILE_CONT_WITH_WEIGHT (:546) — Spark's percentile_approx
takes no weight column. ``weighted_percentile`` implements the weighted
percentile EXACTLY via a cumulative-weight window walk, which both
matches DataFusion's semantics at small scale and is value-checkable
against a DuckDB oracle (a sketch shim would be neither).

Scale: one shuffle on the group key + a per-group sort — same cost class
as any windowed aggregation. For sketch-sized state at extreme
cardinality, fall back to percentile_approx on a weight-expanded sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def weighted_percentile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    q: float,
    out_col: str = "wpct",
) -> DataFrame:
    """Lower-bound weighted percentile: the smallest value whose
    cumulative weight reaches q × total weight (inclusive)."""
    w_cum = (
        W.partitionBy(*group_cols)
        .orderBy(F.col(value_col), F.col(weight_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy(*group_cols)
    ranked = df.select(
        *group_cols,
        F.col(value_col),
        F.sum(weight_col).over(w_cum).alias("_cw"),
        F.sum(weight_col).over(w_all).alias("_tw"),
    ).filter(F.col("_cw") >= F.lit(q) * F.col("_tw"))
    return (
        ranked.groupBy(*group_cols)
        .agg(F.min(value_col).alias(out_col))
    )
