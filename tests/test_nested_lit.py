"""nested_double_lit must be BIT-equal to the F.lit nested form — the r11
optimization swapped every plane/centroid/codebook/sign-matrix literal
from per-element py4j construction (~0.5 ms per float of driver time at
every DataFrame construction) to one SQL parse; these tests pin that the
parsed doubles are identical for every shipped matrix family and for
adversarial values (subnormals, extremes, negative zero)."""

from __future__ import annotations

import random
import struct

from pyspark.sql import functions as F

from ballista_mvp_spark.operators.similarity import hyperplanes, nested_double_lit
from ballista_mvp_spark.queries.extensions import (
    _ANN_LSH_DET_PLANES,
    _ANN_LSH_DET_TABLES,
    _EMB_DET_PLANES,
    _EMB_DET_TABLES,
    _rademacher_sign_vec,
)


def _flat(o):
    if isinstance(o, (list, tuple)):
        for e in o:
            yield from _flat(e)
    else:
        yield o


def _bits(o):
    return [struct.pack("<d", float(x)) for x in _flat(o)]


def assert_lit_equal(spark, obj):
    row = spark.range(1).select(
        F.lit(obj).alias("a"), nested_double_lit(obj).alias("b")
    ).collect()[0]
    assert _bits(row["a"]) == _bits(row["b"])
    df = spark.range(1).select(F.lit(obj).alias("a"), nested_double_lit(obj).alias("b"))
    assert df.schema["a"].dataType == df.schema["b"].dataType


def test_hyperplane_matrices(spark):
    # the two shipped random-plane families (lsh_cosine_dup_pairs, lsh_ann_topk)
    assert_lit_equal(spark, hyperplanes(64, 3, 8, 42))
    assert_lit_equal(spark, hyperplanes(64, 6, 4, 42))


def test_rademacher_sign_matrices(spark):
    assert_lit_equal(
        spark,
        [
            _rademacher_sign_vec(f"{t}:{p}")
            for t in range(_EMB_DET_TABLES)
            for p in range(_EMB_DET_PLANES)
        ],
    )
    assert_lit_equal(
        spark,
        [
            _rademacher_sign_vec(f"annlsh:{t}:{p}")
            for t in range(_ANN_LSH_DET_TABLES)
            for p in range(_ANN_LSH_DET_PLANES)
        ],
    )


def test_adversarial_doubles(spark):
    rng = random.Random(0)
    vals = [rng.gauss(0, 1) * 10 ** rng.randint(-30, 30) for _ in range(300)]
    vals += [0.0, -0.0, 5e-324, 2.2250738585072014e-308, 1.7976931348623157e308,
             -1.7976931348623157e308, 1.0, -1.0, 1 / 3]
    assert_lit_equal(spark, [vals[i::10] for i in range(10)])
