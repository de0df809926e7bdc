"""Skew mitigation — salting for hot keys (SCALE.md knobs section).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) covers skewed JOIN partitions automatically; what it does not
cover is a skewed AGGREGATION key (one key owning a large fraction of all
rows serializes its partition) and pre-AQE-style salted joins when the
runtime stats path is unavailable. Both patterns here are deterministic
(salt is derived by hashing stable columns, never rand()) so results are
reproducible and oracle-checkable.

- salted_agg: two-stage aggregation — stage 1 groups on (keys, salt) and
  partially aggregates (n-way parallel even for a single hot key),
  stage 2 merges partials on keys. Supported merges: sum/count/min/max
  (algebraic aggregates; avg = salted sum+count then divide).
- salted_join: explode the build side n_salt× and salt the probe side —
  the classic hot-key equi-join spread.
- null_split_left_join: null join keys (often 10-30% of a fact table)
  all hash to ONE shuffle partition in an outer join yet can never
  match — route them around the join entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs: {out_col: (fn, in_col)} with fn ∈ sum|count|min|max.
    salt_from: columns whose hash spreads the hot key (defaults to all
    non-key columns — any stable high-cardinality column works)."""
    bad = {fn for fn, _ in aggs.values()} - set(_PARTIAL)
    if bad:
        raise ValueError(f"unsupported salted aggregate fns: {sorted(bad)}")
    salt_cols = salt_from or [c for c in df.columns if c not in keys]
    if not salt_cols:
        raise ValueError(
            "salted_agg: no columns to derive the salt from (every column "
            "is a grouping key) — pass salt_from or add a stable "
            "high-cardinality column"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_PARTIAL[fn](col).alias(out) for out, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[fn](out).alias(out) for out, (fn, _col) in aggs.items()]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salt: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-safe inner equi-join: probe side (left, the skewed one) gets a
    deterministic salt; build side (right) is exploded n_salt× so every
    salted probe partition finds its match. Join key becomes
    (key, salt) — the hot key's rows spread over n_salt partitions."""
    salt_cols = salt_from or [c for c in left.columns if c != left_key]
    if not salt_cols:
        raise ValueError(
            "salted_join: no probe-side columns to derive the salt from "
            "(the key is the only column) — pass salt_from or add a stable "
            "high-cardinality column"
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salt))
    l2 = left.withColumn("_salt", lsalt)
    r2 = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    out = l2.join(r2, (l2[left_key] == r2[right_key]) & (l2["_salt"] == r2["_salt"]))
    return out.drop("_salt")


def null_split_left_join(
    left: DataFrame, right: DataFrame, on: list[str] | str, how: str = "left"
) -> DataFrame:
    """Null-key skew split for LEFT OUTER equi-joins.

    A null join key can never match, but Spark still shuffles those rows
    for a sort-merge left join — and since hash(null) is one value,
    EVERY null-key row lands in the SAME shuffle partition. In training
    corpora "key absent" is routinely 10-30% of a fact table (events
    without a user id, documents without a source id), so the null
    partition becomes the straggler that AQE can only split after
    sorting dead rows.

    The classic fix, as an operator: split the left side on key
    nullness, join only the matchable subset, and union the null-key
    rows back with the right columns null-extended — which is exactly
    what LEFT OUTER semantics dictate for them. The null rows now take
    the union fast path (no shuffle, no sort), and the join's shuffle
    carries matchable rows only. Result is byte-identical to the plain
    left join (oracle-checked in the registry: join_null_skew).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("left", "leftouter", "left_outer"):
        raise ValueError(f"null_split_left_join supports LEFT OUTER only, got {how!r}")
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        # A using-join would carry two columns of the same name into the
        # joined branch, making the unionByName with the null-extended
        # branch fail or bind ambiguously. Require disjoint non-key names.
        raise ValueError(
            "null_split_left_join requires non-key column names to be "
            f"disjoint between left and right; overlapping: {sorted(overlap)}"
        )
    matchable = F.lit(True)
    for k in keys:
        matchable = matchable & F.col(k).isNotNull()
    joined = left.filter(matchable).join(right, keys, "left")
    right_only = [f for f in right.schema.fields if f.name not in set(keys)]
    null_side = left.filter(~matchable).select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in right_only],
    )
    return joined.unionByName(null_side)
