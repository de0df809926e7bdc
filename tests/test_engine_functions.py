"""Engine façade + scalar-function parity-table tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.engine import Engine
from ballista_mvp_spark.functions.scalar import FUNCTIONS, similar_to_regex

from .conftest import SF_SMALL


def test_function_table_covers_reference_enum():
    # 73 ScalarFunction enum entries (datafusion.proto:448-522) — our table
    # carries all of them plus SimilarTo; spot-check the exact count of
    # proto-declared names present.
    proto_names = {
        "Abs", "Acos", "Asin", "Atan", "Ascii", "Ceil", "Cos", "Digest", "Exp",
        "Floor", "Ln", "Log", "Log10", "Log2", "Round", "Signum", "Sin", "Sqrt",
        "Tan", "Trunc", "Array", "RegexpMatch", "BitLength", "Btrim",
        "CharacterLength", "Chr", "Concat", "ConcatWithSeparator", "DatePart",
        "DateTrunc", "InitCap", "Left", "Lpad", "Lower", "Ltrim", "MD5",
        "NullIf", "OctetLength", "Random", "RegexpReplace", "Repeat", "Replace",
        "Reverse", "Right", "Rpad", "Rtrim", "SHA224", "SHA256", "SHA384",
        "SHA512", "SplitPart", "StartsWith", "Strpos", "Substr", "ToHex",
        "ToTimestamp", "ToTimestampMillis", "ToTimestampMicros",
        "ToTimestampSeconds", "Now", "Translate", "Trim", "Upper", "Coalesce",
        "Power", "StructFun", "FromUnixtime", "Atan2", "DateBin", "ArrowTypeof",
        "CurrentDate", "CurrentTime", "Uuid",
    }
    assert len(proto_names) == 73
    missing = proto_names - set(FUNCTIONS)
    assert not missing, f"parity table missing: {missing}"


@pytest.mark.parametrize(
    "pattern,regex",
    [
        ("abc", "^abc$"),
        ("a%c", "^a.*c$"),
        ("a_c", "^a.c$"),
        ("a.c", "^a\\.c$"),
        ("(x|y)%", "^(x|y).*$"),
        ("a[0-9]_", "^a[0-9].$"),
    ],
)
def test_similar_to_translation(pattern, regex):
    assert similar_to_regex(pattern) == regex


def test_engine_lifecycle(spark):
    eng = Engine(spark=spark, seed=7)
    eng.create_external_table("t_li", f"{SF_SMALL}/lineitem.parquet", "parquet")
    assert "t_li" in eng.list_tables()
    n = eng.sql("SELECT count(*) AS n FROM t_li").head().n
    assert n > 0
    eng.create_view("t_v", "SELECT l_orderkey FROM t_li WHERE l_quantity > 10")
    assert eng.sql("SELECT count(*) AS n FROM t_v").head().n < n
    ps = eng.prepare("SELECT count(*) AS n FROM t_li WHERE l_quantity > :q")
    n45 = eng.execute_prepared(ps.handle, args={"q": 45}).head().n
    n5 = eng.execute_prepared(ps.handle, args={"q": 5}).head().n
    assert n45 < n5
    job_id, rows = eng.run_job(eng.sql("SELECT 1 AS one"), "smoke")
    assert rows[0].one == 1 and len(job_id) == 7
    assert "struct" in eng.table_schema("t_li")


def test_date_bin_shim(spark):
    from ballista_mvp_spark.functions.scalar import date_bin

    df = spark.sql("SELECT timestamp'2024-01-01 10:17:33' AS ts")
    got = df.select(F.date_format(date_bin(900, F.col("ts")), "HH:mm:ss").alias("b")).head().b
    assert got == "10:15:00"


def test_approx_aggregates_within_bounds(spark):
    """The rows-only agg_approx query's sketches must land near exact
    values (HLL ±5% at default rsd; percentile_approx within the value
    range) — the accuracy contract behind the weaker driver check."""
    from ballista_mvp_spark.queries.relational import agg_approx
    from ballista_mvp_spark.tables import load_table

    import pyspark.sql.functions as F

    li = load_table(spark, SF_SMALL, "lineitem")
    exact = {
        r.l_returnflag: (r.nd, r.med)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd"),
            F.median("l_quantity").alias("med"),
        )
        .collect()
    }
    for r in agg_approx(spark, SF_SMALL).collect():
        nd_exact, med_exact = exact[r.l_returnflag]
        assert abs(r.apx_nd - nd_exact) / nd_exact < 0.05
        assert abs(r.apx_med - med_exact) <= 2  # quantile sketch tolerance


def test_trunc_number_negative(spark):
    from ballista_mvp_spark.functions.scalar import trunc_number

    df = spark.createDataFrame([(-3.77,), (3.77,)], "x double")
    got = sorted(r.t for r in df.select(trunc_number(F.col("x"), 1).alias("t")).collect())
    assert got == [-3.7, 3.7]


def test_engine_bucketed_table(spark, tmp_path):
    eng = Engine(spark=spark, seed=11)
    df = spark.range(100).withColumnRenamed("id", "k")
    back = eng.create_bucketed_table(
        "eng_bucketed", df, 4, ["k"], sort_cols=["k"], path=str(tmp_path / "eng_bucketed")
    )
    try:
        assert back.count() == 100
        assert spark.catalog.tableExists("eng_bucketed")
    finally:
        spark.sql("DROP TABLE IF EXISTS eng_bucketed")
