"""Transactional order+outbox sink: the reference's S5/T8 leg on Spark.

The reference writes each order and its outbox event in ONE Postgres
transaction and relies on `client_order_id` / `event_id` uniqueness to make
at-least-once delivery effectively exactly-once (DatabaseManager.kt:33-88,
configmap-init.yaml:49, OrderService.kt:94-101). Spark's equivalent
(SURVEY.md §7.3): micro-batch checkpointing makes offset+state progress
atomic, and the sink must be idempotent per batch:

- ``jdbc_orders_outbox_writer`` — the production shape: one connection per
  partition, one transaction per partition-batch, both INSERTs with
  ``ON CONFLICT DO NOTHING`` (idempotent under batch replay). Code-complete
  but requires a JDBC driver jar on the classpath; not exercised in this
  container.
- ``parquet_orders_outbox_writer`` — the locally-verifiable stand-in with
  the same contract: per-batch atomicity via a staging-dir rename, replay
  idempotency via anti-join on the unique key. Used by the EOS tests.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jdbc_orders_outbox_writer(jdbc_url: str, properties: dict[str, str]):
    """foreachBatch writer: atomically upsert orders + outbox over JDBC.

    Returns a (batch_df, epoch_id) callable for
    ``writeStream.foreachBatch``. Each executor partition opens one
    connection, writes its orders and outbox rows in a single transaction,
    and commits — mirroring DatabaseManager.saveOrderWithOutbox, scaled out.
    """

    write_partition = partition_txn_writer(jdbc_url, properties)

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        # Distributed sink: each executor partition opens one connection and
        # commits one transaction — no driver-side collect() bottleneck.
        batch_df.foreachPartition(write_partition)

    return write


def partition_txn_writer(jdbc_url: str, properties: dict[str, str]):
    """The per-partition transaction body (runs ON the executor): one
    connection + ONE transaction per partition, both tables written with
    batched ``executemany``. Idempotent under replay via ON CONFLICT DO
    NOTHING on the unique keys (client_order_id / event_id), so
    at-least-once re-delivery of a whole partition is a no-op — the same
    contract as the reference's per-order transaction
    (DatabaseManager.kt:33-88), amortized over a batch.

    Factored out of the foreachBatch wrapper so its transaction/rollback
    logic is unit-testable with a stub DB-API module (the real driver jar
    is absent in this container).
    """

    def write_partition(rows) -> None:
        rows = list(rows)
        if not rows:
            return
        import importlib

        try:
            jaydebeapi = importlib.import_module("jaydebeapi")  # optional
        except ModuleNotFoundError as exc:
            raise RuntimeError(
                "JDBC sink needs a JDBC bridge (jaydebeapi) + driver jar; "
                "use parquet_orders_outbox_writer for local runs"
            ) from exc
        conn = jaydebeapi.connect(properties["driver"], jdbc_url)
        try:
            cur = conn.cursor()
            cur.executemany(
                "INSERT INTO app.orders (id, client_order_id, symbol, side,"
                " qty, price, status) VALUES (?,?,?,?,?,?,?)"
                " ON CONFLICT (client_order_id) DO NOTHING",
                [
                    [r.id, r.client_order_id, r.symbol, r.side, r.qty, r.price, r.status]
                    for r in rows
                ],
            )
            cur.executemany(
                "INSERT INTO app.outbox (event_id, aggregate_type,"
                " aggregate_id, type, payload) VALUES (?,?,?,?,?)"
                " ON CONFLICT (event_id) DO NOTHING",
                [[r.event_id, "ORDER", r.id, "ORDER_CREATED", r.payload] for r in rows],
            )
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return write_partition


def parquet_orders_outbox_writer(base_dir: str, key_col: str = "client_order_id"):
    """foreachBatch writer with the same exactly-once contract, file-backed.

    Idempotency: rows whose key already exists in the table are dropped
    (ON CONFLICT DO NOTHING). Atomicity: the batch is staged to a temp dir
    and renamed into place — a replayed epoch re-runs the same dedup and
    writes nothing new.
    """
    table_dir = os.path.join(base_dir, "orders")

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df.dropDuplicates([key_col])
        if os.path.exists(table_dir):
            existing = spark.read.parquet(table_dir).select(key_col)
            new = new.join(existing, key_col, "left_anti")
        staged = os.path.join(base_dir, f"_stage_{epoch_id}_{uuid.uuid4().hex[:8]}")
        new.write.mode("overwrite").parquet(staged)
        part_files = [f for f in os.listdir(staged) if f.endswith(".parquet")]
        os.makedirs(table_dir, exist_ok=True)
        for i, f in enumerate(part_files):
            os.rename(
                os.path.join(staged, f),
                os.path.join(table_dir, f"epoch{epoch_id}_{i}_{f}"),
            )
        shutil.rmtree(staged, ignore_errors=True)

    return write


def content_duplicate_report(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """The reference's operational duplicate detectors as an engine op
    (eos-monitor.yaml:29-44, verify-eos.sh:100-112): groups with >1 row."""
    return (
        df.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def parquet_cdc_merge_writer(
    base_dir: str,
    key_cols: list[str],
    ts_col: str = "ts_ms",
    op_col: str = "op",
    tiebreak_cols: list[str] | None = None,
):
    """foreachBatch writer that continuously maintains the CDC current-state
    snapshot: each micro-batch of changes is merged latest-wins into the
    previous snapshot (``operators.order_pipeline.cdc_latest_snapshot`` per
    batch — deletes tombstone keys, ties broken deterministically).

    Publication is versioned: the merged snapshot lands in a fresh
    ``snapshot_epoch*`` directory, then a one-line ``_CURRENT`` pointer file
    is swapped via ``os.replace`` (atomic on POSIX) — readers via
    :func:`read_cdc_snapshot` always see a complete version, never a partial
    write. Replay of an epoch is idempotent: latest-wins merge of
    already-merged rows changes nothing.

    Semantics note (mirrors Kafka log compaction): tombstones are NOT
    retained after they delete a key, so changes must arrive per-key
    time-ordered across batches — the reference's own per-partition Kafka
    ordering guarantee. This is the locally-verifiable twin of a
    Delta/Iceberg MERGE or the JDBC upsert path; superseded versions are
    garbage-collected best-effort after the pointer swap.
    """
    pointer = os.path.join(base_dir, "_CURRENT")

    def _current() -> str | None:
        if os.path.exists(pointer):
            with open(pointer) as fh:
                return os.path.join(base_dir, fh.read().strip())
        return None

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.order_pipeline import cdc_latest_snapshot

        spark = batch_df.sparkSession
        cur = _current()
        changes = batch_df
        if cur and os.path.exists(cur):
            changes = spark.read.parquet(cur).unionByName(batch_df)
        merged = cdc_latest_snapshot(
            changes, key_cols, ts_col=ts_col, op_col=op_col,
            tiebreak_cols=tiebreak_cols,
        )
        vname = f"snapshot_epoch{epoch_id}_{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(os.path.join(base_dir, vname))
        tmp = f"{pointer}.tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as fh:
            fh.write(vname)
        os.replace(tmp, pointer)
        for d in os.listdir(base_dir):
            if d.startswith("snapshot_") and d != vname:
                shutil.rmtree(os.path.join(base_dir, d), ignore_errors=True)

    return write


def read_cdc_snapshot(spark, base_dir: str) -> DataFrame:
    """Read the current CDC snapshot version published by
    :func:`parquet_cdc_merge_writer` (resolves the ``_CURRENT`` pointer)."""
    pointer = os.path.join(base_dir, "_CURRENT")
    with open(pointer) as fh:
        return spark.read.parquet(os.path.join(base_dir, fh.read().strip()))
