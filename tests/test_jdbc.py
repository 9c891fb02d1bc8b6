"""JDBC sink contract tests (no database in this environment): the
upsert statement shape, and the key-uniqueness precondition Postgres
ON CONFLICT DO UPDATE imposes on every batch — enforced by
``dedup_last_writer`` inside ``write_jdbc_upsert``.

The fake DBAPI connection spools executemany params to a shared temp
dir (local mode: executors share the filesystem), so the driver can
assert exactly what would have hit the database.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
import uuid

from hospital_stain_tracker_data_pipeline_spark.sources.jdbc import (
    dedup_last_writer,
    upsert_statement,
    write_jdbc_upsert,
)


def _spool_connect_factory(spool_dir: str):
    """Factory-of-factories: the classes live INSIDE the closure so
    cloudpickle ships them by value — executors cannot import the test
    module (tests/ is not a package on the worker path)."""

    def connect():
        class SpoolCursor:
            def __init__(self):
                self.rows = []

            def executemany(self, sql, batch):
                self.rows.append((sql, [list(map(str, b)) for b in batch]))

        class SpoolConnection:
            def __init__(self):
                self._cur = SpoolCursor()

            def cursor(self):
                return self._cur

            def commit(self):
                path = os.path.join(spool_dir, f"{uuid.uuid4().hex}.json")
                with open(path, "w") as f:
                    json.dump(self._cur.rows, f)

            def rollback(self):
                pass

            def close(self):
                pass

        return SpoolConnection()

    return connect


def test_upsert_statement_shape():
    sql = upsert_statement("t", ["k", "d", "v"], ["k"])
    assert sql == (
        "INSERT INTO t (k, d, v) VALUES (%s, %s, %s) "
        "ON CONFLICT (k) DO UPDATE SET d = EXCLUDED.d, v = EXCLUDED.v"
    )


def test_write_jdbc_upsert_dedups_batch_keys(spark):
    """A batch carrying the same natural key twice (two versions of one
    row in one micro-batch) must reach the DB key-unique, with the
    LAST writer's values — otherwise Postgres raises 'cannot affect
    row a second time'."""
    df = spark.createDataFrame(
        [(1, "a", 0), (1, "a2", 1), (2, "b", 0), (3, "c", 0), (3, "c9", 9)],
        "k long, v string, version long",
    )
    spool = tempfile.mkdtemp(prefix="jdbc_spool_")
    write_jdbc_upsert(
        df, "t", ["k"], _spool_connect_factory(spool), version_col="version"
    )
    written = []
    for path in glob.glob(os.path.join(spool, "*.json")):
        with open(path) as f:
            for _sql, batch in json.load(f):
                written.extend(tuple(b) for b in batch)
    by_key = {}
    for row in written:
        assert row[0] not in by_key, f"duplicate key {row[0]} reached the DB"
        by_key[row[0]] = row
    assert by_key[("1")][1] == "a2" and by_key[("3")][1] == "c9"
    assert set(by_key) == {"1", "2", "3"}


def test_dedup_last_writer_without_version_is_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z")], "k long, v string"
    )
    out1 = sorted(tuple(r) for r in dedup_last_writer(df, ["k"]).collect())
    out2 = sorted(
        tuple(r)
        for r in dedup_last_writer(df.repartition(7), ["k"]).collect()
    )
    assert out1 == out2 == [(1, "y"), (2, "z")]
