"""SCD2 (slowly-changing dimension, type 2) merge — emulated with plain
DataFrame ops (anti-join + union + change detection), since MERGE INTO
needs a Delta/Iceberg table format whose jars are not in this container.
The type-2 versioning semantics (close the open row, append the new
version) follow Kimball & Ross, "The Data Warehouse Toolkit" (3rd ed.,
Wiley 2013), ch. 5 "Slowly Changing Dimension Technique: Type 2".
The emulation IS the scale story:
one shuffle on the business key, no driver-side loops, append-friendly
output (history rows are never rewritten, only the closing timestamp
column of changed rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    change_ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Merge an update batch into an SCD2 history table.

    current: history rows (key, attrs..., valid_from, valid_to) where
    valid_to IS NULL marks the open version. updates: (key, attrs...)
    new observed values, effective at `change_ts`.

    Semantics (standard type-2):
    - open row whose attrs equal the update        → unchanged
    - open row whose attrs differ                  → closed (valid_to=ts)
                                                     + new open row
    - update key absent from current               → new open row
    - closed history rows                          → pass through
    """
    closed_hist = current.filter(F.col(valid_to).isNotNull())
    open_rows = current.filter(F.col(valid_to).isNull())

    # two update rows for one business key would fan the left join out:
    # the open row closes twice and TWO simultaneous open versions
    # appear, silently corrupting the history (and compounding on every
    # later merge). All updates in a batch share one change_ts, so there
    # is no in-batch ordering to resolve by — fail loudly; callers
    # pre-collapse a multi-change batch to its latest row per key.
    dup = (
        updates.groupBy(key).agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"scd2_merge: update batch contains multiple rows for key "
            f"{dup[0][0]!r} — collapse the batch to one row per key "
            "(e.g. the latest change) before merging"
        )
    upd = updates.select(key, *attrs).withColumn("_has_upd", F.lit(1))
    attrs_differ = F.lit(False)
    for a in attrs:
        attrs_differ = attrs_differ | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))

    joined = open_rows.alias("cur").join(upd.alias("upd"), key, "left")
    # explicit indicator column — attr nullability can't signal join misses
    has_update = F.col("_has_upd").isNotNull()
    cmp_cond = has_update & attrs_differ
    # open rows with a differing update → close them
    to_close = joined.filter(cmp_cond).select(
        key,
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col(f"cur.{valid_from}").alias(valid_from),
        change_ts.alias(valid_to),
    )
    # open rows without change (no update, or equal values) → keep open
    unchanged = joined.filter(~cmp_cond).select(
        key,
        *[F.col(f"cur.{a}").alias(a) for a in attrs],
        F.col(f"cur.{valid_from}").alias(valid_from),
        F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
    )
    # new open versions: changed keys + brand-new keys
    changed_new = joined.filter(cmp_cond).select(
        key, *[F.col(f"upd.{a}").alias(a) for a in attrs]
    )
    brand_new = upd.drop("_has_upd").join(open_rows.select(key), key, "left_anti")
    new_open = (
        changed_new.unionByName(brand_new)
        .select(
            key,
            *attrs,
            change_ts.alias(valid_from),
            F.lit(None).cast(current.schema[valid_to].dataType).alias(valid_to),
        )
    )
    return closed_hist.select(key, *attrs, valid_from, valid_to).unionByName(
        to_close
    ).unionByName(unchanged).unionByName(new_open)
