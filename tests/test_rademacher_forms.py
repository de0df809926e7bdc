"""The det-LSH families derive their hyperplanes from ONE md5-parity
generator in two materializations: inlined ±term chains (the SQL-oracle
form, and the pre-r11 Spark form) and ±1.0 sign vectors folded with
zip_with/aggregate (the r11 Spark form — the inlined chains overflowed
janino's 64 KB method limit and paid a failed whole-stage compile per
execution; OPTIMIZATION_r11.md Change 6). These tests pin that the two
forms are IEEE-BIT-IDENTICAL on the real corpus — the property the
oracle certification of sim_ann_lsh_det / dedup_embedding_det rests on
(x + e·(−1.0) must equal x − e exactly, and the fold order must match
the textual left-to-right chain)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballista_mvp_spark.queries.extensions import (
    _rademacher_sign,
    _rademacher_sign_vec,
    _rademacher_terms,
    _t,
)

SF_DIR = "/root/testdata/sf0.001"


def _both_forms(spark, seeds):
    emb = _t(spark, SF_DIR, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    chain = emb.select(
        "vec_id",
        *[
            F.expr(
                "round(0 %s, 9)" % _rademacher_terms(s, "element_at(embedding, {k})")
            ).alias(f"d{i}")
            for i, s in enumerate(seeds)
        ],
    )
    vec = emb.select(
        "vec_id",
        F.transform(
            F.lit([_rademacher_sign_vec(s) for s in seeds]),
            lambda sv: F.round(
                F.aggregate(
                    F.zip_with(F.col("embedding"), sv, lambda a, b: a * b),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                9,
            ),
        ).alias("_d"),
    )
    a = chain.orderBy("vec_id").toPandas()
    b = vec.orderBy("vec_id").toPandas()
    am = a.drop(columns=["vec_id"]).to_numpy(dtype=float)
    bm = np.array([list(r) for r in b["_d"]], dtype=float)
    return am, bm


@pytest.mark.parametrize(
    "seeds",
    [
        [f"annlsh:{t}:{p}" for t in range(8) for p in range(4)],  # sim_ann_lsh_det
        [f"{t}:{p}" for t in range(8) for p in range(3)],  # dedup_embedding_det
    ],
    ids=["annlsh", "embdet"],
)
def test_sign_vec_bitequal_chain(spark, seeds):
    am, bm = _both_forms(spark, seeds)
    assert am.shape == bm.shape and am.shape[0] > 0
    # exact equality — both forms must produce the same IEEE doubles
    assert np.array_equal(am, bm, equal_nan=True)


def test_sign_vec_matches_terms_generator():
    # the ±1.0 vector and the textual chain must come from the same parity
    for seed in ("annlsh:0:0", "3:1", "annpq:2:1"):
        sv = _rademacher_sign_vec(seed)
        terms = _rademacher_terms(seed, "e{k}")
        ops = [tok for tok in terms.split() if tok in "+-"]
        assert [1.0 if o == "+" else -1.0 for o in ops] == sv
        assert sv[0] == (1.0 if _rademacher_sign(seed, 0) else -1.0)
