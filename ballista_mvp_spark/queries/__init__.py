"""Query registry — one entry per certified operator from SURVEY.md §2.

Each submodule exposes ``QUERIES: dict[name -> callable(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name -> DuckDB SQL]``; names missing from
``ORACLES`` get the driver's weaker rows-only check (reserved for
genuinely non-SQL-expressible or nondeterministic ops).

Conventions (see ballista_mvp_spark/oracle.py):
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates whose value depends on accumulation order are rounded
  on both sides;
- every ORDER BY used with LIMIT carries a unique tiebreaker.
"""

from __future__ import annotations

from . import events as _events
from . import extensions as _extensions
from . import functions_q as _functions_q
from . import relational as _relational
from . import tpch as _tpch
from . import windows as _windows

_MODULES = (_tpch, _relational, _functions_q, _windows, _events, _extensions)

ALL_QUERIES: dict = {}
ALL_ORACLES: dict = {}
for _m in _MODULES:
    for _k in _m.QUERIES:
        if _k in ALL_QUERIES:
            raise ValueError(f"duplicate query name: {_k}")
    ALL_QUERIES.update(_m.QUERIES)
    ALL_ORACLES.update(_m.ORACLES)
