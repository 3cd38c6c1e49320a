"""Sink tests (S6-S9 parity). Elasticsearch is exercised against a local
stub HTTP server capturing `_bulk` bodies — validates the sink protocol
without an ES install."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from callysto_spark.sinks import ElasticsearchSink, MemorySink, ParquetSink


def test_parquet_sink_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id long, k string")
    ParquetSink(str(tmp_path / "out"), partition_by=("k",)).write(df)
    back = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(tuple(r) for r in back.select("id", "k").collect()) == [(1, "a"), (2, "b"), (3, "a")]
    assert (tmp_path / "out" / "k=a").exists()


def test_memory_sink(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    sink = MemorySink()
    sink.write(df)
    assert sorted(r["id"] for r in sink.rows) == [1, 2]


def test_elasticsearch_sink_bulk_protocol(spark):
    captured: list[bytes] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            captured.append(self.rfile.read(int(self.headers["Content-Length"])))
            body = json.dumps({"errors": False, "items": []}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            return

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        df = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, body string").coalesce(1)
        ElasticsearchSink(
            index="docs", url=f"http://127.0.0.1:{server.server_port}", id_col="doc_id"
        ).write(df)
        lines = b"".join(captured).decode().strip().split("\n")
        actions = [json.loads(line) for line in lines[0::2]]
        docs = [json.loads(line) for line in lines[1::2]]
        assert {a["index"]["_id"] for a in actions} == {"1", "2"}
        assert all(a["index"]["_index"] == "docs" for a in actions)
        assert sorted(d["body"] for d in docs) == ["x", "y"]
    finally:
        server.shutdown()
        server.server_close()


def test_idempotent_foreach_batch(spark, tmp_path):
    from callysto_spark.sinks.exactly_once import idempotent

    calls = []

    def write(df, batch_id):
        calls.append(batch_id)

    w = idempotent(write, str(tmp_path / "markers"))
    df = spark.createDataFrame([(1,)], "id long")
    w(df, 0)
    w(df, 0)  # replay → skipped
    w(df, 1)
    assert calls == [0, 1]


def test_jdbc_sink_psycopg2_engine_batched_inserts(spark, tmp_path):
    """S9 jar-free engine: per-partition batched INSERTs through the
    connection factory seam — statement shape, batch splitting
    (batchsize), overwrite TRUNCATE, and per-partition COMMIT. The fake
    connection classes are function-local so cloudpickle ships them to
    executors by value."""
    from callysto_spark.sinks import JdbcSink

    class _FileLoggingConn:
        """psycopg2-like connection recording executed statements to a
        JSONL file (executors share the FS in local mode)."""

        def __init__(self, path: str) -> None:
            self.path = path

        def cursor(self):
            return self

        def execute(self, sql, params=None):
            self._log({"sql": sql, "rows": [list(params)] if params else []})

        def executemany(self, sql, rows):
            self._log({"sql": sql, "rows": [list(r) for r in rows]})

        def _log(self, rec):
            import fcntl

            with open(self.path, "a", encoding="utf-8") as fh:
                fcntl.flock(fh, fcntl.LOCK_EX)
                fh.write(json.dumps(rec) + "\n")
                fcntl.flock(fh, fcntl.LOCK_UN)

        def commit(self):
            self._log({"sql": "COMMIT", "rows": []})

        def close(self):
            pass

    class _Factory:
        def __init__(self, path: str) -> None:
            self.path = path

        def __call__(self):
            return _FileLoggingConn(self.path)

    log = str(tmp_path / "stmts.jsonl")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, val string").coalesce(2)
    sink = JdbcSink(
        url="jdbc:postgresql://localhost/db",
        table="t",
        mode="overwrite",
        options={"batchsize": "3"},
        engine="psycopg2",
        connection_factory=_Factory(log),
    )
    sink.write(df)

    recs = [json.loads(line) for line in open(log)]
    sqls = [r["sql"] for r in recs]
    assert sqls[0].startswith("TRUNCATE TABLE t")
    inserts = [r for r in recs if r["sql"].startswith("INSERT")]
    assert all(r["sql"] == 'INSERT INTO t ("id", "val") VALUES (%s, %s)' for r in inserts)
    got = sorted(tuple(row) for r in inserts for row in r["rows"])
    assert got == [(i, f"v{i}") for i in range(10)]
    # batchsize=3 honored: no executemany carries more than 3 rows
    assert max(len(r["rows"]) for r in inserts) <= 3
    # one COMMIT per connection (1 truncate + 2 partitions)
    assert sqls.count("COMMIT") == 3
