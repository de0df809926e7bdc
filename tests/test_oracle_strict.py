"""Unit tests for the driver-faithful strict canonicalization
(oracle._strict_render / _strict_frame) — the mirror of the grading
harness's pandas path that round 3 proved we needed: 5 queries were
green under the lenient gate yet red on the driver because of
array/Decimal output cells."""

from __future__ import annotations

import datetime
from decimal import Decimal

import numpy as np
import pandas as pd
import pytest

from ballista_mvp_spark.oracle import DriverUnsafeCell, _strict_frame, _strict_render


@pytest.mark.parametrize(
    "cell",
    [
        [1, 2],
        (1, 2),
        {"k": 1},
        {1, 2},
        np.array([1.0, 2.0]),
        Decimal("20828.00"),
    ],
)
def test_driver_unsafe_cells_raise(cell):
    with pytest.raises(DriverUnsafeCell):
        _strict_render(cell)


def test_null_forms_unify():
    assert _strict_render(None) == "NULL"
    assert _strict_render(float("nan")) == "NULL"
    assert _strict_render(np.float64("nan")) == "NULL"
    assert _strict_render(pd.NaT) == "NULL"


def test_float_rendering():
    assert _strict_render(-0.0) == "0"
    assert _strict_render(0.12345678944) == _strict_render(0.12345678941)  # round 9
    assert _strict_render(np.float32(2.0)) == _strict_render(2.0)


def test_int_bool_rendering():
    assert _strict_render(np.int32(7)) == "7" == _strict_render(7)
    assert _strict_render(np.bool_(True)) == "True" == _strict_render(True)
    # bool is not rendered as int (pandas sometimes widens one side)
    assert _strict_render(True) != _strict_render(1)


def test_datetime_framings_agree():
    """Spark toPandas can yield datetime.date where DuckDB .df() yields
    datetime64 midnight (and vice versa) — both must render identically."""
    d = datetime.date(2024, 3, 1)
    assert _strict_render(d) == "2024-03-01"
    assert _strict_render(pd.Timestamp("2024-03-01 00:00:00")) == "2024-03-01"
    assert _strict_render(datetime.datetime(2024, 3, 1)) == "2024-03-01"
    # non-midnight keeps time, microseconds trimmed of trailing zeros
    assert _strict_render(pd.Timestamp("2024-03-01 12:30:01")) == "2024-03-01 12:30:01"
    assert (
        _strict_render(pd.Timestamp("2024-03-01 12:30:01.500000"))
        == "2024-03-01 12:30:01.5"
    )


def test_strict_frame_sorts_columns_and_rows():
    a = pd.DataFrame({"B": [2, 1], "a": ["y", "x"]})
    b = pd.DataFrame({"a": ["x", "y"], "B": [1, 2]})
    # lowercased column sort puts 'a' before 'b'; rows sort by rendered tuple
    assert _strict_frame(a) == _strict_frame(b) == [("x", "1"), ("y", "2")]


def test_strict_frame_raises_on_container_column():
    pdf = pd.DataFrame({"id": [1], "arr": [[1, 2, 3]]})
    with pytest.raises(DriverUnsafeCell):
        _strict_frame(pdf)
