"""MaxSim late-interaction scoring vs an independent NumPy reference."""

from __future__ import annotations

import numpy as np

from ballista_mvp_spark.operators import similarity as S


def test_maxsim_matches_numpy(spark):
    rng = np.random.default_rng(11)
    n_docs, vecs_per_doc, dim = 6, 3, 8
    vecs = rng.normal(size=(n_docs, vecs_per_doc, dim))
    rows = [
        (d, d * vecs_per_doc + p, [float(x) for x in vecs[d, p]])
        for d in range(n_docs)
        for p in range(vecs_per_doc)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "vec_id", "vec"])
    queries = df.filter(df.doc_id < 2)
    got = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in S.maxsim_topk(df, queries, "doc_id", "vec", k=3, pos_col="vec_id").collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    for q in range(2):
        scores = {}
        for d in range(n_docs):
            if d == q:
                continue
            scores[d] = round(
                sum(
                    max(cos(vecs[q, p], vecs[d, j]) for j in range(vecs_per_doc))
                    for p in range(vecs_per_doc)
                ),
                6,
            )
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rank, (d, sc) in enumerate(want, start=1):
            assert (q, d) in got, (q, d)
            g_score, g_rank = got[(q, d)]
            assert abs(g_score - sc) < 1e-5 and g_rank == rank, (q, d, got[(q, d)], sc, rank)
