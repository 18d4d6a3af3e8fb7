"""cdc_latest_snapshot (S7 consumer-side completion): latest-wins + delete
tombstones vs a DuckDB row_number oracle, plus edge-case semantics.

Reference path: the outbox relay publishes row changes
(deploy/strimzi/connectors/pg-outbox-connector.yaml:9-53); any consumer that
materializes current state must apply latest-wins-per-key with deletes
removing the key. VERDICT r2 item #8.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from futures_eos_cdc_spark.operators.order_pipeline import cdc_latest_snapshot


def _changes_pdf() -> pd.DataFrame:
    # Hand-built change log exercising: multiple updates per key, ties on
    # ts_ms broken by seq, delete-last (tombstoned), delete-then-reinsert
    # (resurrected), insert-only, and a key whose latest two changes share
    # ts_ms where the LOWER seq is a delete (survivor must be the update).
    rows = [
        # key 1: c -> u -> u  (latest wins)
        (1, "c", 100, 1, "v1a"),
        (1, "u", 200, 2, "v1b"),
        (1, "u", 300, 3, "v1c"),
        # key 2: c -> d  (tombstoned)
        (2, "c", 100, 4, "v2a"),
        (2, "d", 250, 5, None),
        # key 3: c -> d -> c  (resurrected)
        (3, "c", 100, 6, "v3a"),
        (3, "d", 200, 7, None),
        (3, "c", 300, 8, "v3b"),
        # key 4: insert only
        (4, "r", 150, 9, "v4a"),
        # key 5: tie on ts_ms, higher seq is the survivor
        (5, "c", 100, 10, "v5a"),
        (5, "u", 400, 11, "v5b"),
        (5, "u", 400, 12, "v5c"),
        # key 6: tie on ts_ms where the delete has LOWER seq → key survives
        (6, "c", 100, 13, "v6a"),
        (6, "d", 500, 14, None),
        (6, "u", 500, 15, "v6b"),
        # key 7: tie on ts_ms where the delete has HIGHER seq → tombstoned
        (7, "c", 100, 16, "v7a"),
        (7, "u", 500, 17, "v7b"),
        (7, "d", 500, 18, None),
    ]
    return pd.DataFrame(rows, columns=["id", "op", "ts_ms", "seq", "val"])


ORACLE = """
SELECT id, op, ts_ms, seq, val
FROM (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY ts_ms DESC, seq DESC) AS rn
  FROM changes
)
WHERE rn = 1 AND op <> 'd'
ORDER BY id
"""


def test_cdc_latest_snapshot_matches_rownumber_oracle(spark):
    pdf = _changes_pdf()
    changes = spark.createDataFrame(pdf)
    snap = cdc_latest_snapshot(changes, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    got = sorted(
        (int(r.id), r.op, int(r.ts_ms), int(r.seq), r.val) for r in snap.collect()
    )

    con = duckdb.connect()
    con.register("changes", pdf)
    want = [
        (int(i), o, int(t), int(s), v)
        for i, o, t, s, v in con.execute(ORACLE).fetchall()
    ]
    assert got == want
    # Semantics spot-checks (independent of the oracle):
    by_id = {r[0]: r for r in got}
    assert set(by_id) == {1, 3, 4, 5, 6}  # 2 and 7 tombstoned
    assert by_id[1][4] == "v1c"
    assert by_id[3][4] == "v3b"  # delete-then-reinsert resurrects
    assert by_id[5][4] == "v5c"  # ts tie → higher seq wins
    assert by_id[6][4] == "v6b"  # delete loses the tie → key survives


@pytest.mark.parametrize("n_keys,changes_per_key", [(50, 7)])
def test_cdc_latest_snapshot_random_log(spark, n_keys, changes_per_key):
    """Deterministic pseudo-random change log: Spark vs DuckDB row-for-row."""
    import random

    rng = random.Random(42)
    rows = []
    seq = 0
    for k in range(n_keys):
        for _ in range(rng.randint(1, changes_per_key)):
            seq += 1
            op = rng.choice(["c", "u", "u", "u", "d"])
            # Coarse ts with deliberate collisions (ties exercised)
            rows.append((k, op, rng.randint(1, 5) * 100, seq, f"v{seq}" if op != "d" else None))
    pdf = pd.DataFrame(rows, columns=["id", "op", "ts_ms", "seq", "val"])

    snap = cdc_latest_snapshot(
        spark.createDataFrame(pdf), ["id"], ts_col="ts_ms", tiebreak_cols=["seq"]
    )
    got = sorted(
        (int(r.id), r.op, int(r.ts_ms), int(r.seq), r.val) for r in snap.collect()
    )
    con = duckdb.connect()
    con.register("changes", pdf)
    want = [
        (int(i), o, int(t), int(s), v)
        for i, o, t, s, v in con.execute(ORACLE).fetchall()
    ]
    assert got == want


SCD2_ORACLE = """
SELECT id, op, ts_ms, seq, val, valid_to,
       (valid_to IS NULL AND op <> 'd') AS is_current
FROM (
  SELECT *, lead(ts_ms) OVER (PARTITION BY id ORDER BY ts_ms, seq) AS valid_to
  FROM changes
)
WHERE op <> 'd'
ORDER BY id, ts_ms, seq
"""


def test_cdc_scd2_history_matches_lead_oracle(spark):
    from futures_eos_cdc_spark.operators.order_pipeline import cdc_scd2_history

    pdf = _changes_pdf()
    hist = cdc_scd2_history(
        spark.createDataFrame(pdf), ["id"], ts_col="ts_ms", tiebreak_cols=["seq"]
    )
    got = sorted(
        (int(r.id), r.op, int(r.ts_ms), int(r.seq), r.val,
         None if r.valid_to is None else int(r.valid_to), bool(r.is_current))
        for r in hist.collect()
    )
    con = duckdb.connect()
    con.register("changes", pdf)
    want = sorted(
        (int(i), o, int(t), int(s), v, None if vt is None else int(vt), bool(c))
        for i, o, t, s, v, vt, c in con.execute(SCD2_ORACLE).fetchall()
    )
    assert got == want
    # Semantics spot-checks:
    rows = {(r[0], r[3]): r for r in got}
    # key 1 (c@100 -> u@200 -> u@300): chained intervals, last open+current
    assert rows[(1, 1)][5] == 200 and rows[(1, 1)][6] is False
    assert rows[(1, 2)][5] == 300 and rows[(1, 2)][6] is False
    assert rows[(1, 3)][5] is None and rows[(1, 3)][6] is True
    # key 2 (c@100 -> d@250): the delete closes v1's interval, emits nothing,
    # and the key has NO current version
    assert rows[(2, 4)][5] == 250 and rows[(2, 4)][6] is False
    assert not any(k == 2 and cur for (k, _), (*_, cur) in rows.items())
    # key 3 (c -> d -> c): gap between delete and re-insert; new version open
    assert rows[(3, 6)][5] == 200 and rows[(3, 8)][5] is None and rows[(3, 8)][6]
    # key 7 (u@500 then d@500, delete higher seq): version closed at its own
    # ts by the same-ts delete — not current
    assert rows[(7, 17)][5] == 500 and rows[(7, 17)][6] is False


def test_parquet_cdc_merge_writer_maintains_snapshot(spark, tmp_path):
    """Continuous snapshot maintenance (streaming twin of the JDBC upsert):
    per-batch latest-wins merge == one-shot cdc_latest_snapshot over the
    full change log, and epoch replay is a no-op."""
    from futures_eos_cdc_spark.operators.order_pipeline import cdc_latest_snapshot
    from futures_eos_cdc_spark.streaming.outbox import (
        parquet_cdc_merge_writer,
        read_cdc_snapshot,
    )

    schema = "id long, op string, ts_ms long, seq long, val string"
    b1 = spark.createDataFrame(
        [(1, "c", 100, 1, "v1a"), (2, "c", 100, 2, "v2a"), (3, "c", 100, 3, "v3a")],
        schema,
    )
    b2 = spark.createDataFrame(
        [(1, "u", 200, 4, "v1b"), (2, "d", 200, 5, None), (4, "c", 200, 6, "v4a")],
        schema,
    )
    base = str(tmp_path / "cdc_snap")
    import os

    os.makedirs(base)
    write = parquet_cdc_merge_writer(base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    write(b1, 1)
    snap1 = {r.id: r.val for r in read_cdc_snapshot(spark, base).collect()}
    assert snap1 == {1: "v1a", 2: "v2a", 3: "v3a"}

    write(b2, 2)
    expected = {
        (r.id, r.val)
        for r in cdc_latest_snapshot(
            b1.unionByName(b2), ["id"], ts_col="ts_ms", tiebreak_cols=["seq"]
        ).collect()
    }
    got = {(r.id, r.val) for r in read_cdc_snapshot(spark, base).collect()}
    assert got == expected == {(1, "v1b"), (3, "v3a"), (4, "v4a")}

    write(b2, 2)  # replayed epoch: idempotent
    again = {(r.id, r.val) for r in read_cdc_snapshot(spark, base).collect()}
    assert again == expected


def test_cdc_snapshot_time_travel(spark, tmp_path):
    """VERSION AS OF over the store's _VERSIONS.log: with keep_versions=3,
    every published snapshot stays readable by seq (and negative index);
    with the default retention, GC'd versions fail loudly, and history()
    still lists every publish."""
    import os

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        _VersionedParquet,
        parquet_cdc_merge_writer,
        read_cdc_snapshot,
    )

    schema = "id long, op string, ts_ms long, seq long, val string"
    batches = [
        spark.createDataFrame([(1, "c", 100, 1, "v1a")], schema),
        spark.createDataFrame([(1, "u", 200, 2, "v1b")], schema),
        spark.createDataFrame([(1, "u", 300, 3, "v1c"), (2, "c", 300, 4, "v2a")], schema),
    ]
    base = str(tmp_path / "cdc_tt")
    os.makedirs(base)
    write = parquet_cdc_merge_writer(
        base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"], keep_versions=3
    )
    for i, b in enumerate(batches):
        write(b, i + 1)
    write.release()

    def vals(version):
        return {
            r.id: r.val for r in read_cdc_snapshot(spark, base, version=version).collect()
        }

    assert vals(0) == {1: "v1a"}
    assert vals(1) == {1: "v1b"}
    assert vals(2) == {1: "v1c", 2: "v2a"}
    assert vals(-2) == vals(1)  # negative index: previous version
    assert vals(-1) == {r.id: r.val for r in read_cdc_snapshot(spark, base).collect()}
    hist = _VersionedParquet(base).history()
    assert [e["seq"] for e in hist] == [0, 1, 2]
    assert all(e["retained"] for e in hist)
    with pytest.raises(FileNotFoundError):
        read_cdc_snapshot(spark, base, version=99)

    # default retention (2): the oldest of three publishes is GC'd but
    # still listed; reading it names the keep_versions remedy
    base2 = str(tmp_path / "cdc_tt2")
    os.makedirs(base2)
    write2 = parquet_cdc_merge_writer(
        base2, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"], gc_grace_s=0
    )
    for i, b in enumerate(batches):
        write2(b, i + 1)
    write2.release()
    hist2 = _VersionedParquet(base2).history()
    assert [e["retained"] for e in hist2] == [False, True, True]
    with pytest.raises(FileNotFoundError, match="keep_versions"):
        read_cdc_snapshot(spark, base2, version=0)
    assert {r.id: r.val for r in read_cdc_snapshot(spark, base2, version=1).collect()} == {
        1: "v1b"
    }


def test_cdc_writer_fresh_checkpoint_new_run_not_dropped(spark, tmp_path):
    """A restart with a fresh checkpointLocation restarts batch ids at 0.
    The replay gate must be per-run: a NEW writer instance's batch 0 against
    an existing base_dir must merge (latest-wins makes it idempotent), not
    be silently dropped until the id catches up."""
    import os

    from futures_eos_cdc_spark.streaming.outbox import (
        parquet_cdc_merge_writer,
        read_cdc_snapshot,
    )

    schema = "id long, op string, ts_ms long, seq long, val string"
    b1 = spark.createDataFrame([(1, "c", 100, 1, "v1a")], schema)
    b2 = spark.createDataFrame([(1, "u", 200, 2, "v1b"), (2, "c", 200, 3, "v2a")], schema)
    base = str(tmp_path / "cdc_rerun")
    os.makedirs(base)
    run1 = parquet_cdc_merge_writer(base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    run1(b1, 5)  # first run got to batch 5
    run1.release()  # clean shutdown hands the writer lease to the successor
    # fresh checkpoint → new query run → batch ids restart at 0
    run2 = parquet_cdc_merge_writer(base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    run2(b2, 0)
    got = {r.id: r.val for r in read_cdc_snapshot(spark, base).collect()}
    assert got == {1: "v1b", 2: "v2a"}  # batch 0 applied, not dropped
    # same-run replay still skips
    run2(b2, 0)
    assert {r.id: r.val for r in read_cdc_snapshot(spark, base).collect()} == got


def test_agg_writer_cross_run_regression_fails_loudly(spark, tmp_path):
    """⊕-merge cannot replay across runs: a new run's regressed batch id
    against an existing view must raise (not silently drop, not
    double-count)."""
    import os

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        parquet_incremental_agg_writer,
    )

    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, v double")
    base = str(tmp_path / "agg_rerun")
    os.makedirs(base)
    run1 = parquet_incremental_agg_writer(base, ["k"], sum_cols=["v"], lease_ttl_s=0)
    run1(df, 3)
    # crash drill: run1 died un-released; ttl 0 treats its lease as stale
    run2 = parquet_incremental_agg_writer(base, ["k"], sum_cols=["v"], lease_ttl_s=0)
    with pytest.raises(RuntimeError, match="Reset base_dir"):
        run2(df, 0)
    # crash recovery: the app died after publishing batch 3 but before the
    # checkpoint committed — the restarted query replays exactly batch 3.
    # Must be skipped (already in the view), NOT raised, NOT double-counted.
    from futures_eos_cdc_spark.streaming.outbox import read_cdc_snapshot

    run2(df, 3)
    assert {(r.k, float(r.sum_v)) for r in read_cdc_snapshot(spark, base).collect()} == {
        (1, 10.0), (2, 20.0),
    }
    # a normal restart (same checkpoint → ids continue) still works
    run2(df, 4)


def test_versioned_publish_retains_previous_snapshot(spark, tmp_path):
    """GC keeps version N-1 so an in-flight reader of the just-superseded
    snapshot can finish its scan; older versions are deleted (zero grace
    here isolates the count-based rule; the grace window has its own
    test)."""
    import os

    from futures_eos_cdc_spark.streaming.outbox import _VersionedParquet

    base = str(tmp_path / "versions")
    os.makedirs(base)
    store = _VersionedParquet(base, gc_grace_s=0)
    df = spark.createDataFrame([(1,)], "x long")
    store.publish(df, 1, "r")
    v1 = os.path.basename(store.current()[0])
    store.publish(df, 2, "r")
    dirs = {d for d in os.listdir(base) if d.startswith("snapshot_")}
    assert v1 in dirs and len(dirs) == 2  # N and N-1 both present
    store.publish(df, 3, "r")
    dirs = {d for d in os.listdir(base) if d.startswith("snapshot_")}
    assert v1 not in dirs and len(dirs) == 2  # oldest GC'd, N-1 kept


def test_parquet_incremental_agg_writer_matches_batch(spark, sf_dir, tmp_path):
    """Streaming materialized view: incremental count/sum/min/max merge over
    two batches == one-shot batch aggregation (decimal-exact sums), and a
    replayed epoch is skipped (aggregate merge is not naturally idempotent)."""
    from pyspark.sql import functions as F

    from futures_eos_cdc_spark.operators.signal_pipeline import DEC
    from futures_eos_cdc_spark.sources.tables import load_table
    from futures_eos_cdc_spark.streaming.outbox import (
        parquet_incremental_agg_writer,
        read_cdc_snapshot,
    )

    orders = load_table(spark, sf_dir, "orders")
    b1 = orders.filter(F.col("o_orderkey") % 2 == 0)
    b2 = orders.filter(F.col("o_orderkey") % 2 == 1)

    base = str(tmp_path / "agg_view")
    import os

    os.makedirs(base)
    write = parquet_incremental_agg_writer(
        base, ["o_orderpriority"],
        sum_cols=["o_totalprice"], min_cols=["o_totalprice"],
        max_cols=["o_totalprice"],
    )
    write(b1, 1)
    write(b2, 2)
    write(b2, 2)  # replayed epoch must be skipped, not double-counted

    got = {
        r.o_orderpriority: (r.n, float(r.sum_o_totalprice),
                            r.min_o_totalprice, r.max_o_totalprice)
        for r in read_cdc_snapshot(spark, base).collect()
    }
    want = {
        r.o_orderpriority: (r.n, float(r.s), r.mn, r.mx)
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("s"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
        .collect()
    }
    assert got == want and len(got) >= 3


def test_agg_writer_fingerprint_detects_foreign_checkpoint_collision(spark, tmp_path):
    """ADVICE corner: view published at batch N by run A; a NEW checkpoint's
    batch N (genuinely new data) must raise when fingerprints are recorded —
    and a true crash replay (same fingerprint, new run) must still skip."""
    import os

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        parquet_incremental_agg_writer,
        read_cdc_snapshot,
    )

    df = spark.createDataFrame([(1, 10.0)], "k long, v double")
    base = str(tmp_path / "agg_fp")
    os.makedirs(base)
    run_a = parquet_incremental_agg_writer(
        base, ["k"], sum_cols=["v"], checkpoint_fingerprint="/ckpt/A", lease_ttl_s=0
    )
    run_a(df, 0)
    # crash replay: new writer instance, SAME checkpoint → skip, no double count
    run_a2 = parquet_incremental_agg_writer(
        base, ["k"], sum_cols=["v"], checkpoint_fingerprint="/ckpt/A", lease_ttl_s=0
    )
    run_a2(df, 0)
    assert [(r.k, float(r.sum_v)) for r in read_cdc_snapshot(spark, base).collect()] == [(1, 10.0)]
    # foreign checkpoint, colliding batch id → loud failure, not silent drop
    run_b = parquet_incremental_agg_writer(
        base, ["k"], sum_cols=["v"], checkpoint_fingerprint="/ckpt/B", lease_ttl_s=0
    )
    with pytest.raises(RuntimeError, match="not a crash replay"):
        run_b(df, 0)


def test_concurrent_cdc_writer_raises_not_interleaves(spark, tmp_path):
    """The single-writer rule is ENFORCED (r5 VERDICT next-round #7): while
    one writer's lease is live, creating a second writer on the same
    base_dir raises ConcurrentWriterError instead of silently interleaving
    snapshot lineages; a usurped writer's next publish also fails loudly."""
    import os

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        ConcurrentWriterError,
        parquet_cdc_merge_writer,
        read_cdc_snapshot,
    )

    schema = "id long, op string, ts_ms long, seq long, val string"
    b1 = spark.createDataFrame([(1, "c", 100, 1, "v1")], schema)
    base = str(tmp_path / "cdc_lock")
    os.makedirs(base)
    w1 = parquet_cdc_merge_writer(base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    w1(b1, 0)
    with pytest.raises(ConcurrentWriterError, match="held by live writer"):
        parquet_cdc_merge_writer(base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    # clean release hands over; the successor works
    w1.release()
    w2 = parquet_cdc_merge_writer(base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"])
    b2 = spark.createDataFrame([(1, "u", 200, 2, "v2")], schema)
    w2(b2, 0)
    assert {r.val for r in read_cdc_snapshot(spark, base).collect()} == {"v2"}
    # a stale lease (crashed holder, no heartbeats past the ttl) is taken
    # over -- and the usurped writer's next publish fails loudly
    w3 = parquet_cdc_merge_writer(
        base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"], lease_ttl_s=0
    )
    with pytest.raises(ConcurrentWriterError, match="no longer held"):
        w2(b2, 1)
    w3(b2, 1)  # the takeover winner still publishes fine
    w3.release()


def test_agg_writer_lease_blocks_forward_epoch_interleave(spark, tmp_path):
    """The lease closes the agg writer's one silent-corruption hole: a
    concurrent writer whose batch ids are AHEAD of the view would pass the
    epoch gates and merge over the other lineage — it must not get as far
    as constructing."""
    import os

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        ConcurrentWriterError,
        parquet_incremental_agg_writer,
    )

    df = spark.createDataFrame([(1, 10.0)], "k long, v double")
    base = str(tmp_path / "agg_lock")
    os.makedirs(base)
    w1 = parquet_incremental_agg_writer(base, ["k"], sum_cols=["v"])
    w1(df, 0)
    with pytest.raises(ConcurrentWriterError, match="held by live writer"):
        parquet_incremental_agg_writer(base, ["k"], sum_cols=["v"])
    w1.release()


def test_versioned_store_keep_versions_one_gcs_all_but_current(spark, tmp_path):
    """keep_versions=1 must retain ONLY the just-published version (the
    hist[-0:] slicing trap would silently retain everything)."""
    import os

    from futures_eos_cdc_spark.streaming.outbox import _VersionedParquet

    base = str(tmp_path / "kv1")
    os.makedirs(base)
    store = _VersionedParquet(base, keep_versions=1, gc_grace_s=0)
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    store.publish(df, 1)
    store.publish(df, 2)
    store.publish(df, 3)
    hist = store.history()
    assert [e["retained"] for e in hist] == [False, False, True]
    snaps = [d for d in os.listdir(base) if d.startswith("snapshot_")]
    assert len(snaps) == 1


def test_gc_grace_protects_concurrent_time_travel_reader(spark, tmp_path):
    """r6 VERDICT item 6: a reader that resolved an old version's path must
    not have its files deleted by a concurrent publish+GC. With the default
    grace window, keep_versions=1 still leaves the young superseded
    versions on disk (age-based retention on top of count-based); the
    zero-grace control shows GC would otherwise have removed them."""
    import os

    from futures_eos_cdc_spark.streaming.outbox import _VersionedParquet

    df = spark.createDataFrame([(1, "a")], "id long, val string")

    base = str(tmp_path / "graced")
    os.makedirs(base)
    store = _VersionedParquet(base, keep_versions=1)  # default gc_grace_s
    store.publish(df, 1)
    reader_path = store.version_path(0)  # reader resolves BEFORE the swaps
    store.publish(df, 2)
    store.publish(df, 3)  # two publishes later: v0 is outside keep_versions
    # ...but inside the grace window: the resolved path is still readable
    assert os.path.isdir(reader_path)
    assert spark.read.parquet(reader_path).count() == 1
    hist = store.history()
    assert [e["retained"] for e in hist] == [True, True, True]

    # zero-grace control: identical sequence, v0/v1 are gone
    base2 = str(tmp_path / "ungraced")
    os.makedirs(base2)
    store2 = _VersionedParquet(base2, keep_versions=1, gc_grace_s=0)
    store2.publish(df, 1)
    store2.publish(df, 2)
    store2.publish(df, 3)
    assert [e["retained"] for e in store2.history()] == [False, False, True]


def test_lease_lost_mid_publish_aborts_before_pointer_swap(spark, tmp_path):
    """r6 ADVICE #1: a micro-batch longer than the lease TTL lets a second
    writer take over; the first writer's publish must then abort at the
    pre-swap re-verification — the _CURRENT pointer never swaps, so the
    takeover writer's lineage is not interleaved."""
    import os

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        ConcurrentWriterError,
        _VersionedParquet,
        _WriterLease,
    )

    base = str(tmp_path / "midswap")
    os.makedirs(base)
    store = _VersionedParquet(base)
    lease = _WriterLease(base, "writer-A", ttl_s=600)
    lease.acquire()
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    store.publish(df, 1, "writer-A", pre_swap_check=lease.check_and_renew)
    before = store.current()

    # simulate a takeover DURING writer-A's long merge: writer-B now holds
    with open(os.path.join(base, "_WRITER_LOCK"), "w") as fh:
        fh.write("writer-B 0 0")
    with pytest.raises(ConcurrentWriterError, match="took over"):
        store.publish(df, 2, "writer-A", pre_swap_check=lease.check_and_renew)
    assert store.current() == before  # commit point never reached
    # the aborted publish leaves only the documented harmless artifact: a
    # log entry whose version never became current
    assert [e["epoch"] for e in store.history()] == [1, 2]


def test_long_batch_keeps_lease_via_heartbeat(spark, tmp_path):
    """r7 VERDICT #7 (lease liveness): a writer whose batch runs LONGER
    than the TTL no longer loses the lease — the daemon heartbeat keeps
    the mtime fresh between publishes, so a contender's acquire() fails
    while the slow writer lives, and the slow writer still commits.
    (Before the fix the contender would take over and the slow writer
    would fail loudly at the pre-swap check: safe but not live.)"""
    import time as _time

    import pytest

    from futures_eos_cdc_spark.streaming.outbox import (
        ConcurrentWriterError,
        parquet_cdc_merge_writer,
        read_cdc_snapshot,
    )

    schema = "id long, op string, ts_ms long, seq long, val string"
    base = str(tmp_path / "cdc_hb")
    mk = lambda: parquet_cdc_merge_writer(  # noqa: E731
        base, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"], lease_ttl_s=1.0
    )
    w1 = mk()
    w1(spark.createDataFrame([(1, "c", 100, 1, "v1")], schema), 0)
    # "long batch": 2.5x the ttl elapses with NO publish-driven renewal —
    # only the heartbeat (ttl/3 cadence) keeps the lease alive
    _time.sleep(2.5)
    with pytest.raises(ConcurrentWriterError, match="held by live writer"):
        mk()
    # ...and the slow writer still commits
    w1(spark.createDataFrame([(1, "u", 200, 2, "v2")], schema), 1)
    assert {r.val for r in read_cdc_snapshot(spark, base).collect()} == {"v2"}
    # clean release stops the heartbeat and frees the lease immediately
    w1.release()
    w2 = mk()
    w2.release()
