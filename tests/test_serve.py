"""Remote-SQL endpoint tests — the analogue of the reference's Flight SQL
service (ballista/scheduler/src/flight_sql.rs:445-579): a server bound to
a TCP port, a REAL second-process client (beeline over the hive2
protocol), statement execution, and result fetch. The Spark Connect gRPC
service is the second surface; its Python client needs grpcio, which this
container lacks, so that client leg is import-gated and the service is
asserted live at the TCP layer.
"""

from __future__ import annotations

import socket

import pytest

from ballista_mvp_spark.engine import Engine
from ballista_mvp_spark.queries import ALL_QUERIES

from .conftest import SF_SMALL

THRIFT_PORT = 10213
CONNECT_PORT = 15913

Q1_REMOTE_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       count(*) AS count_order
FROM global_temp.lineitem
WHERE l_shipdate <= date'1998-12-01' - interval 90 days
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@pytest.fixture(scope="module")
def served_engine(spark):
    eng = Engine(spark=spark, seed=3)
    eng.publish_testdata(SF_SMALL)
    eng.serve(port=THRIFT_PORT)
    yield eng
    eng.stop_serving()


def test_remote_q1_matches_local(served_engine, spark):
    """Second-process beeline client runs TPC-H Q1 over the wire; values
    must match the in-process (oracle-certified) result exactly."""
    cols, rows = served_engine.remote_sql(Q1_REMOTE_SQL)
    assert cols == ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "count_order"]
    local = spark.sql(Q1_REMOTE_SQL).collect()
    assert len(rows) == len(local) > 0
    for got, want in zip(rows, local):
        assert got[0] == want.l_returnflag and got[1] == want.l_linestatus
        assert abs(float(got[2]) - float(want.sum_qty)) < 1e-6
        assert abs(float(got[3]) - float(want.sum_base_price)) < 1e-6
        assert int(got[4]) == want.count_order


def test_remote_sees_flagship_query_tables(served_engine):
    """Every driver-contract table is resolvable over the remote wire."""
    cols, rows = served_engine.remote_sql(
        "SELECT (SELECT count(*) FROM global_temp.orders) AS o, "
        "(SELECT count(*) FROM global_temp.documents) AS d, "
        "(SELECT count(*) FROM global_temp.embeddings) AS e"
    )
    o, d, e = map(int, rows[0])
    assert o > 0 and d > 0 and e > 0


def test_connect_service_listens(spark):
    eng = Engine(spark=spark)
    eng.serve_connect(port=CONNECT_PORT)
    s = socket.socket()
    try:
        s.settimeout(10)
        s.connect(("localhost", CONNECT_PORT))
    finally:
        s.close()


def test_connect_client_roundtrip(spark):
    """Full Spark Connect client leg — runs only where grpcio exists
    (environment-gated like Avro; see COVERAGE.md)."""
    pytest.importorskip("grpc")
    from pyspark.sql import SparkSession

    eng = Engine(spark=spark)
    eng.serve_connect(port=CONNECT_PORT + 1)
    remote = SparkSession.builder.remote(f"sc://localhost:{CONNECT_PORT + 1}").getOrCreate()
    df = ALL_QUERIES["tpch_q1"](remote, SF_SMALL)
    assert len(df.collect()) == 6
