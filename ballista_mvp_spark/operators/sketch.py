"""Count-min sketch as a DataFrame — bounded-memory frequency estimates.

Complements the built-in sketches already certified (HLL distinct via
hll_sketch_agg, heavy hitters via approx_top_k): CMS answers point
frequency queries ("how often does this token/URL/user appear?") with a
fixed d×w counter matrix, the classic bounded-state shape for 100 TB
streams (Cormode & Muthukrishnan 2005).

Spark-first design: the sketch IS a DataFrame of non-zero cells
(row, col, cnt) — built with one explode (×depth rows of 12 bytes) and
one map-side-combined groupBy, merged by union+groupBy (counter addition
is commutative), probed with a broadcast join. No Python per-row path,
no driver-side state; a 4×65536 sketch is ≤ 256k rows regardless of
input size, so daily/per-source partial sketches can be stored as tiny
parquet tables and rolled up without re-reading the corpus.

Guarantees (asserted in tests/test_sketch.py): estimate ≥ true count
always (counters only over-count); estimate = true count exactly while
distinct items ≤ width (no collisions forced); merge(a,b) equals the
sketch built on the concatenated input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cells(term: Column, depth: int, width: int) -> Column:
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.pmod(F.xxhash64(F.lit(j), term), F.lit(width))
                .cast("int")
                .alias("col"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, term_col: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Build the sketch from one row per item OCCURRENCE. Returns the
    sparse non-zero cells (row, col, cnt)."""
    return (
        df.select(F.explode(_cells(F.col(term_col), depth, width)).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Counter addition — union + re-aggregate. Associative/commutative,
    so partial sketches roll up in any order."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    items: DataFrame,
    term_col: str,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Point estimates for each item in `items`: min over the d probed
    cells (an absent cell is a zero counter). The sketch side is bounded
    (≤ d·w rows) — broadcast it; the probe side streams."""
    probes = items.select(
        F.col(term_col), F.explode(_cells(F.col(term_col), depth, width)).alias("_c")
    ).select(term_col, F.col("_c.row").alias("row"), F.col("_c.col").alias("col"))
    return (
        probes.join(F.broadcast(cms), ["row", "col"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
