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
    with pytest.raises(ValueError, match="always required"):
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
