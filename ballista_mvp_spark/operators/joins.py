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
    if broadcast_right:
        right = F.broadcast(right)
    if how == "right_semi":
        return join(right, left, _flip(on), "left_semi", residual)
    if how == "right_anti":
        return join(right, left, _flip(on), "left_anti", residual)
    if how == "cross":
        df = left.crossJoin(right)
        return df.where(residual) if residual is not None else df
    cond = on
    if residual is not None:
        cond = residual if cond is None else cond & residual
    return left.join(right, cond, how)


def _flip(on):
    return on


def null_safe_eq(a: Column, b: Column) -> Column:
    """``null_equals_null`` (datafusion.proto:263) → Spark ``<=>``."""
    return a.eqNullSafe(b)


def intersect(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    """INTERSECT — DataFusion lowers to LEFTSEMI join (SURVEY.md §2.4)."""
    return a.intersectAll(b) if all else a.intersect(b)


def except_(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    """EXCEPT — DataFusion lowers to LEFTANTI join (SURVEY.md §2.4)."""
    return a.exceptAll(b) if all else a.subtract(b)
