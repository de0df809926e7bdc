"""Persistent IVF index: build/probe round-trip, partition-pruned probe
scan, and incremental append (operators/ann_index.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ballista_mvp_spark.operators import ann_index as AI
from ballista_mvp_spark.operators import similarity as S
from ballista_mvp_spark.tables import load_table

from .conftest import SF_SMALL


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_build_probe_matches_in_session_ivf(spark, tmp_path):
    """The persisted index must answer probes identically to the
    in-session ivf_ann_topk with the same seed/cells/probes — persistence
    must not change results."""
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivf")
    AI.build_ivf_index(emb, path, n_cells=16, seed=42)
    stored = AI.probe_ivf_index(spark, path, queries, k=5, n_probe=4).collect()
    fresh = S.ivf_ann_topk(
        emb, queries, "vec_id", "embedding", k=5, n_cells=16, n_probe=4, seed=42
    ).collect()
    key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
    assert sorted(map(key, stored)) == sorted(map(key, fresh))


def test_probe_scan_prunes_to_probed_cells(spark, tmp_path):
    """The probe's assignments scan must be partition-pruned: the hive
    cell= layout plus the cell join key lets Spark prune to the probed
    cells (via partition filters or dynamic pruning) instead of reading
    the whole corpus — the reason the index is partitioned at all."""
    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    AI.build_ivf_index(emb, path, n_cells=16, seed=42)
    queries = emb.filter(F.col("vec_id") == 0)
    out = AI.probe_ivf_index(spark, path, queries, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "dynamicpruning" in plan.lower(), plan[:1500]
    assert len(out.collect()) == 3


def test_append_extends_index_without_refit(spark, tmp_path):
    """Incremental ingest: appended vectors are probe-visible, assigned
    by the STORED centroids (no refit), and pre-existing rows keep their
    cells (existing partitions are appended to, never rewritten)."""
    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    path = str(tmp_path / "ivf")
    AI.build_ivf_index(base, path, n_cells=16, seed=42)
    before = (
        spark.read.parquet(path + "/assignments")
        .select("vec_id", "cell")
        .collect()
    )
    AI.append_to_ivf_index(extra, path)
    after = spark.read.parquet(path + "/assignments")
    assert after.count() == emb.count()
    kept = {r.vec_id: r.cell for r in after.collect()}
    for r in before:
        assert kept[r.vec_id] == r.cell
    # appended rows must sit in the cell the stored centroids pick
    cents = AI.load_centroids(spark, path)
    expect = {
        r.vec_id: r.cell
        for r in AI._assign_cells(extra, "vec_id", "embedding", cents).collect()
    }
    for vid, cell in expect.items():
        assert kept[vid] == cell
    # and a probe over the full index can now return an appended vector
    q = emb.filter(F.col("vec_id") == 0)
    got = AI.probe_ivf_index(spark, path, q, k=50, n_probe=16).collect()
    assert any(r.neighbor_id >= 400 for r in got)


def test_ivfpq_persisted_probe_matches_in_session(spark, tmp_path):
    """The persisted IVF-PQ index (codes only, no raw vectors) must
    answer probes identically to the in-session ivfpq_topk at the same
    seeds, and its codes table must be vector-free and cell-pruned."""
    emb = _emb(spark).withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 8)
    path = str(tmp_path / "ivfpq")
    AI.build_ivfpq_index(emb, path, dim=64, n_cells=16, m=8, ksub=16, seed=42)
    codes = spark.read.parquet(path + "/codes")
    assert set(codes.columns) == {"vec_id", "codes", "cell"}  # no raw vectors
    assert codes.count() == emb.count()
    stored = AI.probe_ivfpq_index(
        spark, path, queries, raw=emb, k=5, n_probe=4, rerank=50
    ).collect()
    fresh = S.ivfpq_topk(
        emb, queries, dim=64, k=5, n_cells=16, n_probe=4, m=8, ksub=16,
        rerank=50, seed=42,
    ).collect()
    key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
    assert sorted(map(key, stored)) == sorted(map(key, fresh))


def test_delete_rewrites_only_affected_cells(spark, tmp_path):
    """Deleting ids must remove exactly those rows, keep probes correct,
    and leave every untouched cell partition's files byte-identical —
    the O(affected cells) maintenance contract."""
    import glob
    import hashlib
    import os

    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    AI.build_ivf_index(emb, path, n_cells=16, seed=42)

    def file_hashes():
        out = {}
        for f in glob.glob(path + "/assignments/cell=*/*.parquet"):
            with open(f, "rb") as fh:
                out[f] = hashlib.md5(fh.read()).hexdigest()
        return out

    before_rows = {r.vec_id: r.cell for r in spark.read.parquet(path + "/assignments").collect()}
    victims = [0, 1, 2, 3]
    victim_cells = {before_rows[v] for v in victims}
    before_files = file_hashes()

    removed = AI.delete_from_ivf_index(spark, path, victims)
    assert removed == len(victims)
    after = spark.read.parquet(path + "/assignments")
    assert after.count() == len(before_rows) - len(victims)
    assert after.filter(F.col("vec_id").isin(victims)).count() == 0
    # untouched cells byte-stable
    after_files = file_hashes()
    for f, h in before_files.items():
        cell = int(f.split("cell=")[1].split("/")[0])
        if cell not in victim_cells:
            assert after_files.get(f) == h, f
    # probes no longer return deleted neighbors
    q = emb.filter(F.col("vec_id") == 10)
    got = AI.probe_ivf_index(spark, path, q, k=50, n_probe=16).collect()
    assert not any(r.neighbor_id in victims for r in got)
    # deleting absent ids is a no-op
    assert AI.delete_from_ivf_index(spark, path, [999999]) == 0


def test_compact_after_appends_preserves_probes_and_pruning(spark, tmp_path):
    """Many appends -> many small files; compaction must cut the file
    count, keep the cell= layout (probe still partition-prunes), and
    leave probe results identical."""
    emb = _emb(spark)
    path = str(tmp_path / "ivf")
    AI.build_ivf_index(emb.filter(F.col("vec_id") < 300), path, n_cells=8, seed=42)
    for lo in (300, 350, 400, 450):
        AI.append_to_ivf_index(
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)), path
        )
    q = emb.filter(F.col("vec_id") < 4)
    before = AI.probe_ivf_index(spark, path, q, k=5, n_probe=3).collect()
    n_before, n_after = AI.compact_ivf_index(spark, path, target_file_mb=256)
    assert n_after < n_before
    import glob

    assert glob.glob(path + "/assignments/cell=*"), "hive layout lost"
    after = AI.probe_ivf_index(spark, path, q, k=5, n_probe=3)
    plan = after._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "dynamicpruning" in plan.lower()
    key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cos_sim)
    assert sorted(map(key, after.collect())) == sorted(map(key, before))
