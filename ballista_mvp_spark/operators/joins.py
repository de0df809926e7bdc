"""Join-type parity layer.

The reference's JoinNode (reference: ballista/core/proto/datafusion.proto:240-265)
declares 8 equi-join types — INNER, LEFT, RIGHT, FULL, LEFTSEMI, LEFTANTI,
RIGHTSEMI, RIGHTANTI — plus ``null_equals_null`` and a non-equi residual
``filter`` (HashJoinExecNode JoinFilter, datafusion.proto:1299-1313), and a
separate CrossJoinNode (:275-278). Spark natively has inner/left/right/
full/left_semi/left_anti/cross; RIGHTSEMI/RIGHTANTI are expressed by
swapping inputs (semantically identical — DataFusion itself lowers
INTERSECT/EXCEPT to these, SURVEY.md §2.4).

Scale notes: all of these compile to Spark's joins, so strategy selection
(broadcast vs shuffle-hash vs sort-merge) is Catalyst/AQE's job — the
analogue of the reference's stage-time JoinSelection re-optimization
(execution_stage.rs:246-253). Pass ``broadcast_right=True`` to pin a
COLLECT_LEFT-style build-side broadcast (datafusion.proto:1173-1177)
when the caller knows a side is dimension-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = (
    "inner",
    "left",
    "right",
    "full",
    "left_semi",
    "left_anti",
    "right_semi",
    "right_anti",
    "cross",
)


def join(
    left: DataFrame,
    right: DataFrame,
    on: Column | list[str] | None,
    how: str = "inner",
    residual: Column | None = None,
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join with the reference's full 8-type surface + residual filter.

    ``residual`` is the non-equi post-join predicate of
    HashJoinExecNode.JoinFilter — Spark folds it into the join condition,
    which keeps semi/anti/outer semantics correct (a WHERE after an outer
    join would wrongly drop null-extended rows).
    """
    how = how.lower().replace("semi", "_semi").replace("anti", "_anti").replace("__", "_")
    if how in ("right_semi", "right_anti"):
        if broadcast_right:
            # after the input swap the right argument becomes the STREAM
            # side of a left_semi/left_anti, where Spark cannot use a
            # broadcast build (JoinSelection builds semi/anti from the
            # right only) — the hint would be silently dropped, so fail
            # loudly instead of pretending the pin took effect
            raise ValueError(
                f"broadcast_right is not expressible for {how}: the right "
                "side becomes the streamed output side of the swapped "
                "semi/anti join; wrap the LEFT side in F.broadcast(...) "
                "if it is the dimension-sized one"
            )
        return join(right, left, on, how.replace("right", "left"), residual)
    if broadcast_right:
        right = F.broadcast(right)
    if how == "cross":
        df = left.crossJoin(right)
        return df.where(residual) if residual is not None else df
    cond = on
    if residual is not None:
        if isinstance(cond, list):
            # a name-list USING join can't be AND-ed with a residual —
            # build the explicit equi-conditions, then reproduce the
            # USING output shape (one column per key, left/right non-key
            # columns after) so callers see the same schema either way
            keys = cond
            eq = None
            for k in keys:
                c = left[k] == right[k]
                eq = c if eq is None else eq & c
            joined = left.join(right, eq & residual, how)
            if how in ("left_semi", "left_anti"):
                return joined  # left columns only, already USING-shaped
            if how in ("right", "right_outer"):
                key_cols = [right[k].alias(k) for k in keys]
            elif how in ("full", "full_outer", "outer", "fullouter"):
                key_cols = [F.coalesce(left[k], right[k]).alias(k) for k in keys]
            else:
                key_cols = [left[k].alias(k) for k in keys]
            return joined.select(
                *key_cols,
                *[left[c] for c in left.columns if c not in keys],
                *[right[c] for c in right.columns if c not in keys],
            )
        cond = residual if cond is None else cond & residual
    return left.join(right, cond, how)


def null_safe_eq(a: Column, b: Column) -> Column:
    """``null_equals_null`` (datafusion.proto:263) → Spark ``<=>``."""
    return a.eqNullSafe(b)


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    """INTERSECT — DataFusion lowers to LEFTSEMI join (SURVEY.md §2.4)."""
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    """EXCEPT — DataFusion lowers to LEFTANTI join (SURVEY.md §2.4)."""
    return a.exceptAll(b) if all else a.subtract(b)
