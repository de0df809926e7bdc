"""As-of and range joins — extension operators (the reference explicitly
lacks them: no proto node, SURVEY.md §2.4 "Nested-loop / sort-merge /
range / as-of / interval joins — Not present").

Both are built as compositions of existing DataFrame ops (preference
order (a) of the build rules) rather than applyInPandas:

- asof_join: union the two tagged streams, one shuffle on the key, and a
  last-non-null window walk — O(n log n) per key partition, no per-group
  Python, no row explosion. This is the scale-correct form: a
  merge_asof-per-group via applyInPandas would serialize every row
  through Arrow and bound each group by executor memory.

- range_join: time-bucket equi-join + residual filter. Bucketing turns
  the unbounded interval cross-product into an equi-shuffle with a
  bounded fan-out of ceil(range/bucket)+1 candidate buckets per row —
  the standard trick Spark's optimizer doesn't apply automatically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time (direction='backward'; 'forward' gives the
    next right row at-or-after). Output: all left columns + value_cols.
    `tolerance_seconds` nulls the match when the matched right row is
    further than that from the left time (pandas merge_asof tolerance) —
    the matched time rides along as one extra carried column, so the
    bound costs no extra shuffle or join.

    Implementation: tag and union; within each key, sort by (time, tag)
    and carry the last non-null right value forward (last(ignorenulls)
    over an unbounded-preceding window). Right rows sort before left rows
    at equal times so exact-tie matches are included, matching
    pandas.merge_asof / DuckDB ASOF semantics."""
    lt = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_v_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(lt.schema["_lrow"].dataType.simpleString()).alias("_lrow"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    unioned = lt.unionByName(rt)
    if direction == "backward":
        w = (
            W.partitionBy("_k")
            .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    elif direction == "forward":
        w = (
            W.partitionBy("_k")
            .orderBy(F.col("_t").desc(), F.col("_is_left").asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")
    carried = unioned.select(
        "_is_left",
        "_lrow",
        "_t",
        F.last(
            F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True
        ).over(w).alias("_mt"),
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_v_{c}") for c in value_cols],
    )
    # tolerance distance: timestamps compare at MICROSECOND precision
    # (unix_timestamp truncates to seconds, so a 48h+0.4s distance would
    # read exactly 48h and wrongly pass the bound on µs-grained data);
    # numeric time columns (epoch seconds) subtract directly —
    # unix_timestamp() on them is an ANSI type error (and a silent
    # all-NULL match-killer in non-ANSI mode)
    t_dtype = dict(unioned.dtypes)["_t"]
    if t_dtype.startswith("timestamp"):
        def _secs(c: str):  # noqa: E306
            return F.unix_micros(F.col(c)) / F.lit(1_000_000.0)
    elif t_dtype.startswith(("date", "string")):
        def _secs(c: str):
            return F.unix_timestamp(F.col(c))
    else:
        def _secs(c: str):
            return F.col(c).cast("double")
    in_tol = (
        F.lit(True)
        if tolerance_seconds is None
        else F.abs(_secs("_t") - _secs("_mt")) <= F.lit(tolerance_seconds)
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[F.when(in_tol, F.col(f"_v_{c}")).alias(c) for c in value_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: Column,
    right_time: Column,
    lower_seconds: int,
    upper_seconds: int,
    extra_key: str | None = None,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Interval join: pairs where right_time ∈ [left_time + lower,
    left_time + upper]. Equi-join on coarse time buckets (+ optional key)
    with the exact range as residual — bounded candidate fan-out instead
    of a cross product."""
    if bucket_seconds is None:
        bucket_seconds = max(upper_seconds - lower_seconds, 1)
    n_buckets = (upper_seconds - lower_seconds) // bucket_seconds + 2
    # bucketing may truncate to seconds (candidate generation only — the
    # +2 bucket slack absorbs the sub-second remainder); the RESIDUAL
    # below must not, or edge pairs up to 1s outside [lower, upper] (or
    # just before the left time) leak into the result on µs-grained data
    lsec = F.unix_timestamp(left_time)
    rsec = F.unix_timestamp(right_time)
    lb = left.withColumn(
        "_bucket",
        F.explode(
            F.array(
                *[
                    F.floor((lsec + F.lit(lower_seconds)) / bucket_seconds) + i
                    for i in range(n_buckets)
                ]
            )
        ),
    )
    rb = right.withColumn("_bucket", F.floor(rsec / bucket_seconds))
    on = ["_bucket"] + ([extra_key] if extra_key else [])
    joined = lb.join(rb, on)
    lus = F.unix_micros(left_time)
    rus = F.unix_micros(right_time)
    return joined.filter(
        (rus >= lus + lower_seconds * 1_000_000)
        & (rus <= lus + upper_seconds * 1_000_000)
    ).drop("_bucket")
