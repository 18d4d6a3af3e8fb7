"""Unified admission gate (r7 VERDICT #8): one writer API for all four
dedup kinds, one atomically-committed index contract for the index-able
three. Parity is pinned against the existing batch operators — the gate
delegates to them, so these tests prove the unified layer adds no drift.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.dedup import (
    contained_in_corpus,
    content_digest_expr,
    minhash_dedup_against_corpus,
    simhash64_dedup_against_corpus,
)
from futures_eos_cdc_spark.operators.gate_index import DedupGateIndex
from futures_eos_cdc_spark.streaming.pipeline import dedup_gate_writer


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def _split(docs):
    """Batch/corpus split with INJECTED hits so every kind's gate fires:
    exact clones of corpus docs (new ids, same text → exact/minhash/
    simhash hits) and verbatim fragments of long corpus docs (→
    containment hits; a clone is NOT a containment hit — the container
    must be strictly longer)."""
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    clones = corpus.filter(
        (F.col("doc_id") % 4 == 1) & (F.col("doc_id") < 80)
    ).select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    fragments = corpus.filter(
        (F.col("doc_id") % 4 == 2)
        & (F.col("doc_id") < 100)
        & (F.length("text") >= 200)
    ).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.substring("text", 10, 80).alias("text"),
    )
    batch = (
        docs.filter(F.col("doc_id") % 4 == 0).unionByName(clones).unionByName(fragments)
    )
    return batch, corpus


def _raw_survivors(kind, batch, corpus):
    if kind == "exact":
        hashes = corpus.select(
            content_digest_expr(["text"], corpus).alias("h")
        ).distinct()
        return batch.withColumn(
            "h", content_digest_expr(["text"], batch)
        ).join(hashes, "h", "left_anti").drop("h")
    if kind == "minhash":
        return minhash_dedup_against_corpus(batch, corpus)
    if kind == "simhash64":
        return simhash64_dedup_against_corpus(batch, corpus)
    return contained_in_corpus(batch, corpus)


@pytest.mark.parametrize("kind", ["exact", "minhash", "simhash64", "containment"])
def test_index_gate_matches_raw_corpus(spark, sf_dir, tmp_path, kind):
    batch, corpus = _split(_docs(spark, sf_dir))
    want = {r.doc_id for r in _raw_survivors(kind, batch, corpus).collect()}
    assert len(want) < batch.count()  # the gate really fires on the fixture

    # containment verification reads container text from the corpus table
    ckw = {"corpus_docs": corpus} if kind == "containment" else {}
    idx = DedupGateIndex.build(corpus, str(tmp_path / kind), kind)
    got = {r.doc_id for r in idx.gate(batch, **ckw).collect()}
    assert got == want

    # reopen from disk: kind + options come from metadata, not the caller
    reopened = DedupGateIndex.open(str(tmp_path / kind))
    got2 = {r.doc_id for r in reopened.gate(batch, **ckw).collect()}
    assert got2 == want


@pytest.mark.parametrize("kind", ["exact", "minhash", "simhash64", "containment"])
def test_unified_writer_matches_batch_operator(spark, sf_dir, tmp_path, kind):
    """The one-API foreachBatch writer admits exactly what the batch
    operator admits, for every kind, over a real file-source stream."""
    batch, corpus = _split(_docs(spark, sf_dir))
    want = {r.doc_id for r in _raw_survivors(kind, batch, corpus).collect()}

    path = str(tmp_path / "stream_src")
    batch.coalesce(1).write.mode("overwrite").parquet(path)
    got = set()

    def sink(df, epoch_id):
        got.update(r.doc_id for r in df.collect())

    q = (
        spark.readStream.schema("doc_id long, text string")
        .parquet(path)
        .writeStream.foreachBatch(dedup_gate_writer(kind, sink, corpus=corpus))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == want


def test_unified_writer_with_index_and_append(spark, sf_dir, tmp_path):
    """Index path end-to-end: gate a batch against the committed index,
    append the survivors, and verify the grown index now rejects them."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "minhash")
    w = dedup_gate_writer("minhash", lambda df, e: None, corpus_index=idx)

    survivors = idx.gate(batch)
    n_surv = survivors.count()
    assert 0 < n_surv < batch.count()
    idx.append(survivors)
    # every admitted doc is now an exact member of the index → re-gating
    # the same batch admits nothing
    assert idx.gate(batch).count() == 0
    # the writer built above keeps working against the grown index
    w(batch, 0)


def test_uncommitted_batch_is_invisible(spark, sf_dir, tmp_path):
    """Atomicity (the bands/shingles gap): a batch whose table files are
    written but whose manifest line never landed — a crashed or in-flight
    append — must not change what readers see, for ANY table of the
    kind."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "minhash")
    before = {r.doc_id for r in idx.gate(batch).collect()}

    # simulate the crash: write the batch's tables, skip _commit
    bid = "deadbeef0000"
    for table, df in idx._batch_tables(batch).items():
        df.write.parquet(os.path.join(idx.path, table, f"b_{bid}"))
    after = {r.doc_id for r in idx.gate(batch).collect()}
    assert after == before  # nothing from the uncommitted batch is probed

    # ...and a later commit of that same batch id makes it visible
    idx._commit(bid)
    assert idx.gate(batch).count() == 0


def test_containment_index_accelerated_writer_matches_batch(spark, sf_dir, tmp_path):
    """Containment with the persisted gram index + corpus table admits
    exactly what the raw-recompute gate admits (the index changes the
    plan, never the rows)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    want = {r.doc_id for r in _raw_survivors("containment", batch, corpus).collect()}
    idx = DedupGateIndex.build(corpus, str(tmp_path / "cont"), "containment")
    got = set()

    def sink(df, epoch_id):
        got.update(r.doc_id for r in df.collect())

    w = dedup_gate_writer("containment", sink, corpus=corpus, corpus_index=idx)
    w(batch, 0)  # writers are plain (batch_df, epoch) callables
    assert got == want


def test_append_epoch_idempotent(spark, sf_dir, tmp_path):
    """A retried foreachBatch epoch (same token) commits exactly once:
    the second append is a no-op returning the first batch id, the
    manifest gains no line, the index tables gain no rows, and the gate
    output is unchanged (r8 VERDICT wrong #1)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "minhash")
    survivors = idx.gate(batch)
    assert survivors.count() > 0

    bid1 = idx.append(survivors, token="stream-a/7")
    lines_after_first = idx._manifest_rows()
    rows_after_first = {
        t: df.count() for t, df in idx.tables(spark).items()
    }
    gate_after_first = {r.doc_id for r in idx.gate(batch).collect()}

    # the retry: same epoch token, same rows
    bid2 = idx.append(survivors, token="stream-a/7")
    assert bid2 == bid1
    assert idx._manifest_rows() == lines_after_first
    assert {t: df.count() for t, df in idx.tables(spark).items()} == rows_after_first
    assert {r.doc_id for r in idx.gate(batch).collect()} == gate_after_first

    # a DIFFERENT epoch is a genuine append
    bid3 = idx.append(survivors, token="stream-a/8")
    assert bid3 != bid1
    assert len(idx._manifest_rows()) == len(lines_after_first) + 1

    # token hygiene: stored as one manifest field
    with pytest.raises(ValueError, match="whitespace-free"):
        idx.append(survivors, token="epoch 9")


def test_append_concurrent_writers_serialized(spark, sf_dir, tmp_path):
    """Two concurrent appenders: both batches commit and become visible,
    manifest seq numbers are dense and collision-free (the lease
    serializes read-seq-then-append; r8 VERDICT wrong #1)."""
    import threading

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    a = batch.filter(F.col("doc_id") % 2 == 0)
    b = batch.filter(F.col("doc_id") % 2 == 1)

    bids, errs = {}, []

    def run(name, df):
        try:
            bids[name] = idx.append(df, token=f"w-{name}/0")
        except Exception as exc:  # pragma: no cover - failure detail
            errs.append(exc)

    ts = [threading.Thread(target=run, args=(n, d)) for n, d in [("a", a), ("b", b)]]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    rows = idx._manifest_rows()
    assert len(rows) == 3  # build + both appends
    seqs = [int(r[0]) for r in rows]
    assert seqs == list(range(3))  # dense, no read-then-append collision
    committed = idx._committed()
    assert bids["a"] in committed and bids["b"] in committed
    # both batches visible: re-gating the full batch admits nothing
    assert idx.gate(batch).count() == 0


def test_writer_append_survivors_epoch_exactly_once(spark, sf_dir, tmp_path):
    """The production wiring: one writer that gates, sinks, AND appends
    survivors under the epoch token. A retried epoch (foreachBatch's
    failure unit) grows the index exactly once — on retry the gate sees
    the already-appended survivors, delivers the empty remainder to the
    (idempotent) sink, and the token-keyed append is a no-op."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    deliveries = []

    def sink(df, epoch_id):
        deliveries.append((epoch_id, {r.doc_id for r in df.collect()}))

    with pytest.raises(ValueError, match="pass corpus_index"):
        dedup_gate_writer("exact", sink, corpus=corpus, append_survivors=True)

    w = dedup_gate_writer(
        "exact", sink, corpus_index=idx, append_survivors=True, stream_id="s1"
    )
    w(batch, 7)
    assert deliveries[-1][1]  # something was admitted
    manifest_after = idx._manifest_rows()
    assert idx._token_bids().get("s1/7")

    w(batch, 7)  # the RETRY: same epoch id, same rows
    assert idx._manifest_rows() == manifest_after  # index grew exactly once
    assert deliveries[-1] == (7, set())  # survivors already admitted

    # a later epoch with genuinely new rows grows the index again
    fresh = batch.select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" r9-novel-suffix")).alias("text"),
    )
    w(fresh, 8)
    assert deliveries[-1][1]  # the novel texts were admitted
    assert idx._token_bids().get("s1/8")
    assert len(idx._manifest_rows()) == len(manifest_after) + 1


def test_containment_coverage_contract_enforced(spark, sf_dir, tmp_path):
    """assert_coverage=True turns the documented corpus⊇index contract
    into an error: a container id present in the gram index but missing
    from corpus_docs raises instead of silently admitting its duplicates
    (r8 VERDICT wrong #2)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "cont"), "containment")

    # full corpus: the check passes and the gate result is unchanged
    want = {r.doc_id for r in idx.gate(batch, corpus_docs=corpus).collect()}
    got = {
        r.doc_id
        for r in idx.gate(batch, corpus_docs=corpus, assert_coverage=True).collect()
    }
    assert got == want

    # drop some indexed containers from the corpus table → loud failure
    holey = corpus.filter(F.col("doc_id") % 3 != 0)
    with pytest.raises(ValueError, match="coverage violation"):
        idx.gate(batch, corpus_docs=holey, assert_coverage=True)
    # ...which is exactly the silent-admission case without the flag
    admitted_with_hole = {
        r.doc_id for r in idx.gate(batch, corpus_docs=holey).collect()
    }
    assert admitted_with_hole >= want


def test_structural_guard_catches_default_built_index(spark, sf_dir, tmp_path):
    """ADVICE r8: an index built with DEFAULT structural options must
    still conflict with a caller passing a different explicit value (the
    old guard compared the caller's value to itself when the build-time
    opts lacked the key)."""
    from futures_eos_cdc_spark.operators.dedup import SHINGLE_K

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "m"), "minhash")  # default k
    assert idx.effective_structural("k") == SHINGLE_K
    with pytest.raises(ValueError, match="conflicts with the index"):
        dedup_gate_writer(
            "minhash", lambda df, e: None, corpus_index=idx, k=SHINGLE_K + 2
        )
    # matching the effective default is NOT a conflict
    w = dedup_gate_writer(
        "minhash", lambda df, e: None, corpus_index=idx, k=SHINGLE_K
    )
    w(batch, 0)

    cidx = DedupGateIndex.build(
        corpus, str(tmp_path / "c"), "containment"
    )  # default gram_n=16
    assert cidx.effective_structural("gram_n") == 16
    with pytest.raises(ValueError, match="conflicts with the index"):
        dedup_gate_writer(
            "containment", lambda df, e: None, corpus=corpus,
            corpus_index=cidx, gram_n=8,
        )
    eidx = DedupGateIndex.build(corpus, str(tmp_path / "e"), "exact")
    assert eidx.effective_structural("content_cols") == ["text"]
    with pytest.raises(ValueError, match="conflicts with the index"):
        dedup_gate_writer(
            "exact", lambda df, e: None, corpus_index=eidx,
            content_cols=["text", "doc_id"],
        )


def test_api_validation(spark, sf_dir, tmp_path):
    batch, corpus = _split(_docs(spark, sf_dir))
    with pytest.raises(ValueError, match="expected one of"):
        DedupGateIndex.build(corpus, str(tmp_path / "c"), "bogus")
    idx = DedupGateIndex.build(corpus, str(tmp_path / "e"), "exact")
    with pytest.raises(FileExistsError, match="open"):
        DedupGateIndex.build(corpus, str(tmp_path / "e"), "exact")
    with pytest.raises(ValueError, match="only meaningful for"):
        idx.gate(batch, corpus_docs=corpus)
    with pytest.raises(ValueError, match="kind="):
        dedup_gate_writer("bogus", lambda df, e: None, corpus=corpus)
    with pytest.raises(ValueError, match="exactly one"):
        dedup_gate_writer("exact", lambda df, e: None)
    with pytest.raises(ValueError, match="not 'minhash'"):
        dedup_gate_writer("minhash", lambda df, e: None, corpus_index=idx)
    with pytest.raises(ValueError, match="corpus is required"):
        dedup_gate_writer("containment", lambda df, e: None)
    cidx = DedupGateIndex.build(corpus, str(tmp_path / "ci"), "containment")
    with pytest.raises(ValueError, match="pass corpus_docs"):
        cidx.gate(batch)
    # structural options are pinned by the index; gate-time thresholds vary
    midx = DedupGateIndex.build(corpus, str(tmp_path / "m"), "minhash", k=3)
    with pytest.raises(ValueError, match="not gate-time"):
        midx.gate(batch, k=5)
    with pytest.raises(ValueError, match="conflicts with the index"):
        dedup_gate_writer("minhash", lambda df, e: None, corpus_index=midx, k=5)
    # an impossible jaccard threshold admits the whole batch — proof the
    # gate-time parameter genuinely varies over the same index tables
    assert midx.gate(batch, threshold=1.01).count() == batch.count()


def test_index_time_travel_prefix_read(spark, sf_dir, tmp_path):
    """as_of reads a manifest PREFIX — the index exactly as it stood
    after that commit, so yesterday's admission decision replays
    bit-for-bit after today's appends (the free time travel the
    single-manifest-line design buys)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    admitted_v0 = {r.doc_id for r in idx.gate(batch).collect()}
    assert admitted_v0

    idx.append(idx.gate(batch), token="e/1")  # grow: survivors indexed
    assert idx.gate(batch).count() == 0  # today's head rejects them
    # ...but as_of=0 (the build commit) replays the original decision
    replay = {r.doc_id for r in idx.gate(batch, as_of=0).collect()}
    assert replay == admitted_v0
    # head == as_of=latest
    latest = len(idx._committed()) - 1
    assert idx.gate(batch, as_of=latest).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="out of range"):
        idx.tables(spark, as_of=99)
    with _pytest.raises(ValueError, match="out of range"):
        idx.tables(spark, as_of=-1)


def test_writer_append_survivors_checkpoint_replay(spark, sf_dir, tmp_path):
    """End-to-end exactly-once under the REAL streaming failure mode: run
    the admit-then-index writer under a checkpointed stream, then delete
    the epoch's commit marker (offsets kept) and restart — Structured
    Streaming replays the epoch, the gate re-delivers only the
    already-admitted remainder (empty), and the token-keyed append leaves
    the index byte-identical."""
    import os
    import shutil

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")

    src = str(tmp_path / "src")
    batch.coalesce(1).write.mode("overwrite").parquet(src)
    ckpt = str(tmp_path / "ckpt")
    admitted = []

    def sink(df, epoch_id):
        admitted.append((epoch_id, {r.doc_id for r in df.collect()}))

    def run_stream(ckpt_dir):
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .writeStream.foreachBatch(
                dedup_gate_writer(
                    "exact", sink, corpus_index=idx,
                    append_survivors=True, stream_id="ckpt-test",
                )
            )
            .option("checkpointLocation", ckpt_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
            q.awaitTermination(30)

    run_stream(ckpt)
    assert admitted and admitted[0][1]  # epoch 0 admitted the survivors
    manifest_v1 = idx._manifest_rows()
    assert idx._token_bids().get("ckpt-test/0")

    # forge the crash-before-commit: clone the checkpoint (a fresh path —
    # Spark caches metadata logs per path in-session) and drop the last
    # epoch's commit marker; the restarted query replays that epoch from
    # the retained offsets — exactly the failure window between the sink
    # side effects and the checkpoint commit
    ckpt2 = str(tmp_path / "ckpt_replay")
    shutil.copytree(ckpt, ckpt2)
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt2, "commits"))
        if not f.startswith(".")
    )
    last = commits[-1]
    os.remove(os.path.join(ckpt2, "commits", last))
    crc = os.path.join(ckpt2, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)  # stale checksum makes the commit rename fail

    run_stream(ckpt2)
    replayed = admitted[1:]
    assert replayed, "restart did not replay the epoch"
    assert all(s == set() for _, s in replayed)  # remainder only: empty
    assert idx._manifest_rows() == manifest_v1  # index grew exactly once


def test_commit_heals_crashed_committer_lease(spark, sf_dir, tmp_path):
    """A committer that died INSIDE the manifest critical section leaves
    its lease file behind; the next append must heal by stale takeover
    within the commit-lease TTL instead of blocking for the versioned
    store's 600 s default."""
    import os
    import time as _time

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")

    # forge the crash: a foreign lease file, mtime older than the commit TTL
    lock = os.path.join(idx.path, "_WRITER_LOCK")
    with open(lock, "w") as fh:
        fh.write("commit-deadbeef 99999 0.0")
    stale = _time.time() - DedupGateIndex._COMMIT_TTL_S - 5
    os.utime(lock, (stale, stale))

    t0 = _time.monotonic()
    idx.append(batch.limit(5), token="heal/0")
    took = _time.monotonic() - t0
    assert idx._token_bids().get("heal/0")
    assert took < DedupGateIndex._COMMIT_WAIT_S  # healed, not timed out


def test_compact_preserves_gate_and_consolidates_files(spark, sf_dir, tmp_path):
    """Compaction rewrites N committed batches into one and atomically
    swaps the manifest: gate output is bit-identical, the manifest is a
    single line, the batch-dir count collapses, and the pre-compaction
    manifest survives as the audit copy."""
    import os

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "minhash")
    # grow the index with several appends (disjoint novel texts)
    for i in range(3):
        chunk = batch.filter(F.col("doc_id") % 3 == i).select(
            (F.col("doc_id") + (i + 1) * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" novel-{i}")).alias("text"),
        )
        idx.append(chunk, token=f"grow/{i}")
    before = {r.doc_id for r in idx.gate(batch).collect()}
    n_batches_before = len(idx._committed())
    assert n_batches_before == 4  # build + 3 appends

    bid = idx.compact(spark, target_partitions=2)
    assert idx._committed() == [bid]
    after = {r.doc_id for r in idx.gate(batch).collect()}
    assert after == before  # logical content unchanged
    # batch dirs: old ones remain as orphans (GC out-of-band), readers
    # resolve only the consolidated one
    dirs = os.listdir(os.path.join(idx.path, "bands"))
    assert f"b_{bid}" in dirs and len(dirs) == n_batches_before + 1
    assert any(
        f.startswith("_MANIFEST.log.pre-") for f in os.listdir(idx.path)
    )
    # appends keep working on the compacted index
    idx.append(batch.limit(3).select(
        (F.col("doc_id") + 9_000_000).alias("doc_id"), "text"
    ), token="post/0")
    assert len(idx._committed()) == 2


def test_compact_aborts_on_concurrent_commit(spark, sf_dir, tmp_path):
    """A batch that commits between compaction's snapshot read and its
    manifest swap must abort the swap loudly (it would otherwise vanish
    from the compacted index)."""
    from futures_eos_cdc_spark.streaming.outbox import ConcurrentWriterError

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")

    real_committed = DedupGateIndex._committed
    snapshots = {"n": 0}

    class Sneaky(DedupGateIndex):
        def _committed(self):
            rows = real_committed(self)
            # after the first (snapshot) read, simulate a concurrent
            # appender landing a line before the lease re-check
            if snapshots["n"] == 0:
                snapshots["n"] = 1
                with open(os.path.join(self.path, "_MANIFEST.log"), "a") as fh:
                    fh.write(f"{len(rows)} feedfacefeed {0.0}\n")
            return rows

    sneaky = Sneaky(idx.path, idx.kind, idx.id_col, idx.text_col, idx.opts)
    with pytest.raises(ConcurrentWriterError, match="during compaction"):
        sneaky.compact(spark)
    # the index is untouched: both lines present, gate still works
    assert len(idx._committed()) == 2


def test_gc_removes_aged_orphans_only(spark, sf_dir, tmp_path):
    """gc() deletes only UNREFERENCED batch dirs past the grace window:
    compaction orphans age out, live batches and young orphans stay, and
    the gate is unaffected throughout."""
    import os
    import time as _time

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    idx.append(
        batch.limit(10).select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
        ),
        token="g/0",
    )
    bid = idx.compact(spark, target_partitions=1)
    before = {r.doc_id for r in idx.gate(batch).collect()}

    # young orphans survive a graceful pass
    assert idx.gc(grace_s=3600) == []

    # age the orphans, keep the live batch young
    tdir = os.path.join(idx.path, "digests")
    old = _time.time() - 7200
    for d in os.listdir(tdir):
        if d != f"b_{bid}":
            os.utime(os.path.join(tdir, d), (old, old))
    deleted = idx.gc(grace_s=3600)
    assert len(deleted) == 2  # build + append orphans
    assert sorted(os.listdir(tdir)) == [f"b_{bid}"]
    assert {r.doc_id for r in idx.gate(batch).collect()} == before


def test_compact_carries_epoch_tokens_forward(spark, sf_dir, tmp_path):
    """Code-review r9: a streaming epoch retried ACROSS a compaction must
    still be a no-op — compaction re-points every idempotency token at
    the consolidated batch instead of dropping them — and the reserved
    marker prefix can never collide with caller tokens."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch)
    idx.append(surv, token="s1/41")
    bid = idx.compact(spark, target_partitions=1)

    # the retry across the compaction: no new line, no new rows
    rows_before = idx._manifest_rows()
    got = idx.append(surv, token="s1/41")
    assert got == bid  # token now names the consolidated batch
    assert idx._manifest_rows() == rows_before

    # readers scan the consolidated dir ONCE despite multiple lines
    assert idx._committed() == [bid]
    # the compaction marker is not an idempotency token...
    assert not any(
        t.startswith("__") for t in idx._token_bids()
    )
    # ...and callers cannot mint colliding tokens
    with pytest.raises(ValueError, match="reserved"):
        idx.append(surv, token="__compacted-3")


def test_review_r9_option_validation(spark, sf_dir, tmp_path):
    """assert_coverage is refused where it cannot run, and the
    admit-then-index writer is refused for containment (it cannot also
    grow corpus_docs — the coverage gap would silently admit dups)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    midx = DedupGateIndex.build(corpus, str(tmp_path / "m"), "minhash")
    with pytest.raises(ValueError, match="containment coverage contract"):
        midx.gate(batch, assert_coverage=True)
    cidx = DedupGateIndex.build(corpus, str(tmp_path / "c"), "containment")
    with pytest.raises(ValueError, match="unsupported for kind='containment'"):
        dedup_gate_writer(
            "containment", lambda df, e: None, corpus=corpus,
            corpus_index=cidx, append_survivors=True,
        )


def test_compact_resets_orphan_gc_clock(spark, sf_dir, tmp_path):
    """Code-review r9: day-old batches orphaned by a compaction must get
    the FULL grace window from the moment of the swap, not zero."""
    import os
    import time as _time

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    # age the (still referenced) build batch a day into the past
    tdir = os.path.join(idx.path, "digests")
    old = _time.time() - 86400
    for d in os.listdir(tdir):
        os.utime(os.path.join(tdir, d), (old, old))
    idx.compact(spark, target_partitions=1)
    # immediately after the swap, the day-old orphan is NOT collectable:
    # its clock was reset at the moment it became unreferenced
    assert idx.gc(grace_s=300) == []


# ---------------------------------------------------------------------------
# r10: structural GC safety, self-corpus containment, maintenance loop
# ---------------------------------------------------------------------------
def test_gc_spares_inflight_append_at_zero_grace(spark, sf_dir, tmp_path):
    """r9 VERDICT next #4: an in-flight append is GC-proof by
    CONSTRUCTION (live _PENDING_<bid> intent), not by sizing the grace —
    a zero-grace GC run mid-append must not touch its batch dirs."""
    import threading

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch)

    # slow the table-write phase down artificially: run gc() from a
    # second thread the moment the intent file appears
    gc_results = []
    seen_pending = threading.Event()

    def gc_when_pending():
        while not seen_pending.wait(0.01):
            pass
        gc_results.append(idx.gc(grace_s=0.0))

    orig = DedupGateIndex._batch_tables

    def slow_tables(self, docs):
        out = orig(self, docs)
        seen_pending.set()
        import time as _t

        _t.sleep(1.0)  # let the concurrent gc() run against live intent
        return out

    t = threading.Thread(target=gc_when_pending)
    t.start()
    DedupGateIndex._batch_tables = slow_tables
    try:
        bid = idx.append(surv, token="s1/0")
    finally:
        DedupGateIndex._batch_tables = orig
    t.join(timeout=10)
    assert gc_results and gc_results[0] == []  # gc ran, deleted nothing
    assert bid in idx._committed()
    # and the committed batch is fully readable (nothing half-deleted)
    idx.tables(spark)["digests"].count()
    assert not any(
        f.startswith("_PENDING_") for f in os.listdir(idx.path)
    )  # intent removed on commit


def test_gc_reaps_crashed_append_intent_after_ttl(spark, sf_dir, tmp_path):
    """A CRASHED append (intent present, heartbeats stopped, no commit)
    is reaped once the intent ages past the TTL: first the intent goes
    stale, then the orphan dirs fall to the normal grace rule."""
    import time as _t

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch)

    # simulate the crash: write the tables + intent, never commit
    bid = "deadbeef0000"
    intent = os.path.join(idx.path, f"_PENDING_{bid}")
    with open(intent, "w") as fh:
        fh.write("0 0\n")
    for table, df in idx._batch_tables(surv).items():
        df.write.mode("error").parquet(os.path.join(idx.path, table, f"b_{bid}"))

    # intent still live → structurally protected even at zero grace
    assert idx.gc(grace_s=0.0) == []
    assert os.path.exists(intent)

    # age the intent past the TTL and the dirs past the grace
    old = _t.time() - max(idx._INTENT_TTL_S, 10) - 1
    os.utime(intent, (old, old))
    os.utime(os.path.join(idx.path, "digests", f"b_{bid}"), (old, old))
    deleted = idx.gc(grace_s=5.0)
    assert deleted == [f"b_{bid}"]
    assert not os.path.exists(intent)


def test_manifest_seq_unique_after_compaction(spark, sf_dir, tmp_path):
    """ADVICE r9: post-compaction appends must not re-mint seq values the
    carried-token lines already used — seq derives from the raw line
    count, so every line's seq is unique and monotone."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch)
    idx.append(surv, token="s1/1")
    idx.append(surv.limit(3), token="s1/2")
    idx.compact(spark, target_partitions=1)
    idx.append(surv.limit(1), token="s1/3")
    seqs = [int(row[0]) for row in idx._manifest_rows()]
    assert len(seqs) == len(set(seqs)), seqs
    assert seqs == sorted(seqs), seqs


def test_self_corpus_containment_gate_and_atomic_append(spark, sf_dir, tmp_path):
    """r9 VERDICT next #6: a self_corpus containment index carries its
    own container text; gate parity with the raw operator, and grams +
    corpus_docs commit under ONE manifest line (retried epoch appends
    both exactly once; a crash between table writes and commit admits
    nothing — both tables are unreachable, not half-visible)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    want = {r.doc_id for r in _raw_survivors("containment", batch, corpus).collect()}

    idx = DedupGateIndex.build(
        corpus, str(tmp_path / "sc"), "containment", self_corpus=True
    )
    got = {r.doc_id for r in idx.gate(batch).collect()}
    assert got == want
    # coverage holds by construction — the assert passes trivially
    got2 = {r.doc_id for r in idx.gate(batch, assert_coverage=True).collect()}
    assert got2 == want
    # passing an external corpus against a self-corpus index is refused
    with pytest.raises(ValueError, match="carries its own corpus_docs"):
        idx.gate(batch, corpus_docs=corpus)

    # epoch-idempotent append grows BOTH tables exactly once
    surv = idx.gate(batch)
    t0 = idx.tables(spark)
    g0, c0 = t0["grams"].count(), t0["corpus_docs"].count()
    idx.append(surv, token="s1/5")
    idx.append(surv, token="s1/5")  # the retry
    t1 = idx.tables(spark)
    assert len(idx._committed()) == 2
    assert t1["grams"].count() > g0
    assert t1["corpus_docs"].count() == c0 + surv.count()

    # crash between the table writes and the commit: nothing visible
    bid = "cafecafe0000"
    for table, df in idx._batch_tables(batch.limit(2)).items():
        df.write.mode("error").parquet(os.path.join(idx.path, table, f"b_{bid}"))
    t2 = idx.tables(spark)
    assert t2["grams"].count() == t1["grams"].count()
    assert t2["corpus_docs"].count() == t1["corpus_docs"].count()


def test_self_corpus_containment_writer_append_survivors(spark, sf_dir, tmp_path):
    """The admit-then-index writer, previously refused for containment,
    works against a self_corpus index: survivors of epoch N block their
    own duplicates in epoch N+1, exactly-once under retry."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(
        corpus, str(tmp_path / "sc"), "containment", self_corpus=True
    )
    deliveries = []

    def sink(df, epoch_id):
        deliveries.append((epoch_id, {r.doc_id for r in df.collect()}))

    w = dedup_gate_writer(
        "containment", sink, corpus_index=idx,
        append_survivors=True, stream_id="cw",
    )
    # epoch 0: long novel docs admitted and indexed (with their text)
    novel = batch.filter(F.length("text") >= 200).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.lit("zq xv "), F.col("text")).alias("text"),
    )
    w(novel, 0)
    admitted = deliveries[-1][1]
    assert admitted
    # epoch 1: fragments of epoch-0 docs — contained in the JUST-appended
    # containers, so the gate drops them (text came from the index itself)
    frags = novel.filter(F.length("text") >= 200).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.substring("text", 8, 90).alias("text"),
    )
    w(frags, 1)
    assert deliveries[-1] == (1, set())
    # retry of epoch 0 appends nothing new
    rows = idx._manifest_rows()
    w(novel, 0)
    assert idx._manifest_rows() == rows

    # the default-layout refusal still stands
    didx = DedupGateIndex.build(corpus, str(tmp_path / "dc"), "containment")
    with pytest.raises(ValueError, match="unsupported for kind='containment'"):
        dedup_gate_writer(
            "containment", sink, corpus=corpus,
            corpus_index=didx, append_survivors=True, stream_id="x",
        )


def test_writer_requires_explicit_stream_id(spark, sf_dir, tmp_path):
    """ADVICE r9: append_survivors without an explicit stream_id is
    refused — epoch ids are per-query, and a shared default would
    silently no-op the second stream's epochs."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    with pytest.raises(ValueError, match="explicit stream_id"):
        dedup_gate_writer(
            "exact", lambda df, e: None, corpus_index=idx,
            append_survivors=True,
        )


def test_maintenance_loop_compact_gc_under_appends(spark, sf_dir, tmp_path):
    """r9 VERDICT next #7: the production wiring — appends interleaved
    with compact() + gc() from a second thread. Invariants: the gate
    result never changes, no committed batch is ever lost, and the final
    compact+gc bound the on-disk batch-dir count."""
    import threading

    from futures_eos_cdc_spark.streaming.outbox import ConcurrentWriterError

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch).persist()
    chunks = [surv.filter(F.col("doc_id") % 5 == i) for i in range(5)]
    want = {r.doc_id for r in idx.gate(batch).collect()}

    stop = threading.Event()
    maint_errors = []

    def maintain():
        while not stop.wait(0.05):
            try:
                idx.compact(spark, target_partitions=1)
            except ConcurrentWriterError:
                pass  # a batch committed mid-pass — documented abort
            except FileNotFoundError:
                pass  # nothing to compact yet
            except Exception as exc:  # noqa: BLE001
                maint_errors.append(exc)
            try:
                # nonzero grace IN THE LOOP: the main thread is reading,
                # and the grace window is exactly the documented reader
                # protection for freshly-orphaned (mtime-reset) dirs —
                # zero-grace-under-readers would be a contract violation,
                # not a test of one. Zero grace runs once at the end.
                idx.gc(grace_s=10.0)
            except Exception as exc:  # noqa: BLE001
                maint_errors.append(exc)

    t = threading.Thread(target=maintain)
    t.start()
    try:
        for i, c in enumerate(chunks):
            idx.append(c, token=f"m/{i}")
            # every committed batch remains gate-readable mid-maintenance
            assert idx.tables(spark)["digests"].count() >= 0
    finally:
        stop.set()
        t.join(timeout=30)
    surv.unpersist()
    assert not maint_errors, maint_errors

    # all five appends survived every compaction (tokens carried forward)
    toks = set(idx._token_bids())
    assert {f"m/{i}" for i in range(5)} <= toks
    # gate over the final index: the appended survivors now block their
    # own duplicates; the original corpus hits are still blocked
    after = {r.doc_id for r in idx.gate(batch).collect()}
    assert after == set()  # every batch row was appended, so all blocked
    assert want  # (and the pre-append gate really admitted something)

    # final maintenance bounds the file count: one consolidated dir
    idx.compact(spark, target_partitions=1)
    idx.gc(grace_s=0.0)
    dirs = [
        d for d in os.listdir(os.path.join(idx.path, "digests"))
        if d.startswith("b_")
    ]
    assert len(dirs) == 1, dirs


def test_append_aborts_commit_when_intent_reaped(spark, sf_dir, tmp_path, monkeypatch):
    """Code-review r10: an appender that stalled past the intent TTL
    (intent reaped, dirs possibly GC'd) must ABORT its commit — a
    manifest line naming deleted files would brick every reader, since
    the bid counts as live and gc never cleans committed batches."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch)
    rows_before = idx._manifest_rows()

    orig = DedupGateIndex._batch_tables

    def stall_tables(self, docs):
        out = orig(self, docs)
        # simulate the >TTL stall + gc reap between the table writes
        # and the commit: the intent file disappears
        for fn in os.listdir(self.path):
            if fn.startswith("_PENDING_"):
                os.unlink(os.path.join(self.path, fn))
        return out

    monkeypatch.setattr(DedupGateIndex, "_batch_tables", stall_tables)
    with pytest.raises(RuntimeError, match="retry the append"):
        idx.append(surv, token="s1/9")
    monkeypatch.undo()
    assert idx._manifest_rows() == rows_before  # nothing committed
    assert "s1/9" not in idx._token_bids()
    idx.tables(spark)["digests"].count()  # index still fully readable


def test_compact_aborts_swap_when_intent_reaped(spark, sf_dir, tmp_path, monkeypatch):
    """Code-review r10: a compactor stalled past the intent TTL must not
    swap the manifest — its UNREFERENCED consolidated dirs may already
    be GC'd, and the swap would leave the manifest pointing at nothing
    (total index loss)."""
    import shutil as _shutil

    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    idx.append(idx.gate(batch), token="s1/0")
    want = {r.doc_id for r in idx.gate(batch).collect()}
    rows_before = idx._manifest_rows()

    real_copy = _shutil.copyfile

    def reap_then_copy(src, dst):
        # the audit copy runs just before the swap — reap the intent
        # there to simulate gc winning a >TTL stall race
        for fn in os.listdir(idx.path):
            if fn.startswith("_PENDING_"):
                os.unlink(os.path.join(idx.path, fn))
        return real_copy(src, dst)

    monkeypatch.setattr(_shutil, "copyfile", reap_then_copy)
    with pytest.raises(RuntimeError, match="rerun the compaction"):
        idx.compact(spark, target_partitions=1)
    monkeypatch.undo()
    assert idx._manifest_rows() == rows_before  # manifest untouched
    assert {r.doc_id for r in idx.gate(batch).collect()} == want


def test_gc_intent_recheck_closes_scan_race(spark, sf_dir, tmp_path, monkeypatch):
    """Code-review r10 (TOCTOU): an intent created AFTER gc's one-shot
    root listdir must still protect its batch dirs — the per-dir
    re-check stats the intent fresh at the point of deletion."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    surv = idx.gate(batch)

    # an uncommitted batch with an OLD dir mtime (well past any grace)
    # but a LIVE intent
    bid = "feedfeed0000"
    for table, df in idx._batch_tables(surv).items():
        d = os.path.join(idx.path, table, f"b_{bid}")
        df.write.mode("error").parquet(d)
        import time as _t

        old = _t.time() - 86400
        os.utime(d, (old, old))
    with open(os.path.join(idx.path, f"_PENDING_{bid}"), "w") as fh:
        fh.write("0 0\n")

    # simulate "intent appeared after the scan": hide _PENDING_ entries
    # from the ROOT listdir only (the pre-scan), leaving the file itself
    # on disk for the per-dir re-check to stat
    real_listdir = os.listdir

    def hiding_listdir(path="."):
        out = real_listdir(path)
        if os.path.abspath(str(path)) == os.path.abspath(idx.path):
            return [f for f in out if not f.startswith("_PENDING_")]
        return out

    monkeypatch.setattr(os, "listdir", hiding_listdir)
    deleted = idx.gc(grace_s=0.0)
    monkeypatch.undo()
    assert deleted == []  # the live intent protected the aged dirs
    assert os.path.isdir(os.path.join(idx.path, "digests", f"b_{bid}"))


# ---------------------------------------------------------------------------
# r10: Bloom-bitmap sidecar for the exact gate
# ---------------------------------------------------------------------------


def test_bloom_sidecar_gate_parity_and_append_growth(spark, sf_dir, tmp_path):
    """The bloom-accelerated exact gate admits EXACTLY the rows the plain
    digest anti-join admits (the filter has no false negatives; its
    positives all pass the verify join), and the sidecar grows with
    appends: a batch admitted-and-appended is fully rejected on replay."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(
        corpus, str(tmp_path / "idx"), "exact", bloom=True
    )
    assert "bloom" in idx._table_names()
    plain = {r.doc_id for r in idx.gate(batch, use_bloom=False).collect()}
    fast = {r.doc_id for r in idx.gate(batch, use_bloom=True).collect()}
    auto = {r.doc_id for r in idx.gate(batch).collect()}  # auto = on
    assert fast == plain == auto
    idx.append(idx.gate(batch), token="s/0")
    assert idx.gate(batch).count() == 0  # every survivor now indexed


def test_bloom_sidecar_plan_and_compaction(spark, sf_dir, tmp_path):
    """Plan shape: negatives bypass the anti-join via the union branch
    and the probe is the bit_get projection. Compaction preserves the
    sidecar (rows concatenate; bit_or folding is order-independent)."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(
        corpus, str(tmp_path / "idx"), "exact", bloom=True, bloom_m_hex=3
    )
    plan = idx.gate(batch)._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan and "bit_get" in plan
    want = {r.doc_id for r in idx.gate(batch).collect()}
    idx.append(batch.limit(7), token="s/1")
    want2 = {r.doc_id for r in idx.gate(batch).collect()}
    idx.compact(spark, target_partitions=1)
    assert {r.doc_id for r in idx.gate(batch).collect()} == want2
    assert want2 <= want


def test_bloom_sidecar_option_guards(spark, sf_dir, tmp_path):
    """bloom=True is exact-only; use_bloom on a bloom-less index or a
    non-exact kind fails loudly instead of faking acceleration."""
    batch, corpus = _split(_docs(spark, sf_dir))
    with pytest.raises(ValueError, match="kind='exact'"):
        DedupGateIndex.build(
            corpus, str(tmp_path / "m"), "minhash", bloom=True
        )
    plain_idx = DedupGateIndex.build(corpus, str(tmp_path / "plain"), "exact")
    with pytest.raises(ValueError, match="no bloom table"):
        plain_idx.gate(batch, use_bloom=True).collect()
    assert plain_idx.gate(batch, use_bloom=False).count() > 0  # explicit off ok
    mh = DedupGateIndex.build(corpus, str(tmp_path / "mh"), "minhash")
    with pytest.raises(ValueError, match="use_bloom"):
        mh.gate(batch, use_bloom=True)


def test_bloom_sidecar_streaming_writer_exactly_once(spark, sf_dir, tmp_path):
    """The admit-then-index writer on a bloom=True index: the per-epoch
    append publishes the batch's filter increment under the same token,
    so a retried epoch neither re-delivers nor double-sets bits, and the
    replayed gate (bloom-accelerated, auto mode) rejects everything."""
    batch, corpus = _split(_docs(spark, sf_dir))
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact", bloom=True)
    deliveries = []

    def sink(df, epoch_id):
        deliveries.append((epoch_id, {r.doc_id for r in df.collect()}))

    w = dedup_gate_writer(
        "exact", sink, corpus_index=idx, append_survivors=True, stream_id="sb"
    )
    w(batch, 1)
    admitted = deliveries[-1][1]
    assert admitted
    manifest_after = idx._manifest_rows()
    w(batch, 1)  # retry
    assert idx._manifest_rows() == manifest_after
    assert deliveries[-1] == (1, set())
    # and a plain-join gate agrees with the accelerated one post-append
    assert idx.gate(batch, use_bloom=False).count() == 0
