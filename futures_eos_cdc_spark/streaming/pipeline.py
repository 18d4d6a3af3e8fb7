"""Structured Streaming shell for the signal→decision pipeline.

Maps the reference's Kafka Streams topology onto Spark Structured Streaming
(SURVEY.md §2.9):

- T1/T3  5-min tumbling window, zero grace → window() + withWatermark 0s
         (late rows dropped identically)
- T2     append mode = exactly one decision per (symbol, window) — the
         engine default (deliberate re-spec, §7.4.4); update mode available
         via output_mode for reference-like per-trigger emission cadence
- T7     content dedup → dropDuplicatesWithinWatermark
- S1-S4  sources: file stream (tests/demo), rate source (load probes), and a
         Kafka builder (requires the spark-sql-kafka package on the
         classpath — gated, not bundled in this container)
- T5/T6  state + exactly-once: checkpointLocation carries offsets + state
         atomically per micro-batch; end-to-end EOS needs an idempotent sink
         (streaming/outbox.py) — same guarantee as the reference, different
         mechanics (§7.3)

Streaming plan shape: unlike the batch path (window functions), streaming
uses ONE stateful aggregation per (symbol, window) that collects the window's
signals and computes every A2-A10/D1-D5 quantity with array expressions in
the finishing projection. One shuffle, one state store; state per key is
bounded by the rows that fall in one 5-minute window per symbol. At 100 TB/d
ingest with few symbols that per-key bound is the thing to watch — the
mitigation is pre-aggregating per (symbol, window, timeframe) with chained
windowed aggregations (Spark ≥3.4 supports multiple stateful operators), at
the cost of a second state store; the array form keeps the demo simple and
bit-compatible with the batch path (decimal-exact folds, same tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.signal_pipeline import (
    BUFFER_KEEP,
    DEC,
    PRICE_MULT,
    TOP_RECENT,
    WINDOW_SECONDS,
)
from ..schemas import SIGNAL_WIRE_SCHEMA

SIGNAL_STREAM_SCHEMA = (
    "signal_id long, symbol string, side string, qty double, price double, "
    "timeframe string, ts_us long"
)

# T5: the reference's RocksDB state store (SignalTopology.kt:30-37, spilled
# keyed state + changelog recovery) maps to Spark's RocksDB provider — set
# this session conf before starting a stateful stream; checkpointLocation
# replaces the changelog topic. Bundled with Spark ≥3.2, no extra jars.
ROCKSDB_STATE_STORE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


# ---------------------------------------------------------------------------
# Sources
# ---------------------------------------------------------------------------
def read_signal_stream_files(spark: SparkSession, path: str) -> DataFrame:
    """File-based signal stream (parquet drops) — the test/demo source; the
    schema matches operators.signal_pipeline.signals_from_events output."""
    return spark.readStream.schema(SIGNAL_STREAM_SCHEMA).parquet(path)


def read_signal_stream_rate(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Rate-source synthetic signals (T9 load probe; P17 generator shape).

    Deterministic expressions over the rate source's (timestamp, value):
    symbols/timeframes round-robin, price = base*(1 ± 0.3%), qty ~ U(0.01,0.5)
    via seeded rand — mirrors the reference generator's distributions
    (apps/signal-generator/Main.kt:100-115)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    sym = F.col("value") % 5
    base = (
        F.when(sym == 0, 65000.0)
        .when(sym == 1, 3000.0)
        .when(sym == 2, 160.0)
        .when(sym == 3, 0.6)
        .otherwise(20000.0)
    )
    return rate.select(
        F.col("value").alias("signal_id"),
        F.when(sym == 0, "BTCUSDT")
        .when(sym == 1, "ETHUSDT")
        .when(sym == 2, "SOLUSDT")
        .when(sym == 3, "XRPUSDT")
        .otherwise("NAS100")
        .alias("symbol"),
        F.when(F.rand(42) < 0.5, "BUY").otherwise("SELL").alias("side"),
        (F.rand(43) * 0.49 + 0.01).alias("qty"),
        (base * (1.0 + (F.rand(44) - 0.5) * 0.006)).alias("price"),
        F.when(F.col("value") % 3 == 0, "1m")
        .when(F.col("value") % 3 == 1, "5m")
        .otherwise("15m")
        .alias("timeframe"),
        F.unix_micros(F.col("timestamp")).alias("ts_us"),
    )


def read_signal_stream_kafka(
    spark: SparkSession,
    brokers: str,
    topics: str = "trading.signal.1m,trading.signal.5m,trading.signal.15m",
) -> DataFrame:
    """Kafka source (S1): one multi-topic subscription replaces the
    reference's 3 sources + merge (U1). Requires the spark-sql-kafka
    package on the classpath; raises a clear error if absent."""
    try:
        raw = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topics)
            .load()
        )
    except Exception as exc:  # pragma: no cover - needs kafka jars
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 package on the "
            "Spark classpath (spark.jars.packages=org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<spark-version>)"
        ) from exc
    parsed = raw.withColumn(
        "s", F.from_json(F.col("value").cast("string"), SIGNAL_WIRE_SCHEMA)
    )
    return (
        parsed.filter(F.col("s").isNotNull() & F.col("s.symbol").isNotNull())
        .select("s.*")
        .withColumn("ts_us", F.col("ts") * 1000)
        .withColumn("signal_id", F.monotonically_increasing_id())
    )


# ---------------------------------------------------------------------------
# T7: content dedup within watermark (the EOS demo's input dedup)
# ---------------------------------------------------------------------------
def dedup_signals(signals: DataFrame, ts_col: str = "event_time") -> DataFrame:
    """Drop byte-identical duplicate signals (eos-demo.sh's 5x injection →
    one survivor) while state is bounded by the watermark."""
    return signals.dropDuplicatesWithinWatermark(
        ["symbol", "side", "price", "qty", "timeframe", "ts_us"]
    )


def stream_bpe_token_counts(
    stream: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of ``operators.bpe.doc_bpe_token_counts``: exact BPE
    token accounting at INGESTION time. The apply is a pure projection
    (the merge-table replace chain — no state, no watermark, no
    foreachBatch), so the same expressions plan natively on a stream and
    per-row cost equals the batch pass. Train offline, ``load_bpe_merges``
    the table, meter the stream — the shape a token-budgeted ingestion
    pipeline actually runs."""
    from ..operators.bpe import doc_bpe_token_counts

    return doc_bpe_token_counts(stream, merges, id_col=id_col, text_col=text_col)


def bpe_token_meter_writer(
    merges,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch twin of the PRODUCTION-vocab apply
    (``operators.bpe.doc_bpe_token_counts_joined``): meters a document
    stream in exact BPE tokens at merge depths the replace-chain
    projection cannot reach (8-32 k ranks). The join apply needs a
    per-micro-batch distinct + aggregation, so it runs under foreachBatch
    with full batch semantics — the dedup-gate rationale. The pure-stream
    projection twin (:func:`stream_bpe_token_counts`) remains the right
    shape for small merge tables.

    Returns a (batch_df, epoch_id) callable handing the per-doc count
    rows (same schema as the batch operator) to ``sink``."""
    from ..operators.bpe import doc_bpe_token_counts_joined

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        sink(
            doc_bpe_token_counts_joined(
                batch_df, merges, id_col=id_col, text_col=text_col
            ),
            epoch_id,
        )

    return write


def unigram_token_meter_writer(
    pieces,
    sink,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch unigram-LM token meter — the
    :func:`bpe_token_meter_writer` twin for the SentencePiece-style
    tokenizer (operators/unigram.py): Viterbi apply needs a
    per-micro-batch distinct-word pass + aggregation, so it runs under
    foreachBatch with full batch semantics; per-doc count rows (same
    schema as ``doc_unigram_token_counts``) go to ``sink``."""
    from ..operators.unigram import doc_unigram_token_counts

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        sink(
            doc_unigram_token_counts(
                batch_df, pieces, id_col=id_col, text_col=text_col
            ),
            epoch_id,
        )

    return write


def stream_quality_gate(
    stream: DataFrame,
    threshold: float = 0.0,
    text_col: str = "text",
) -> DataFrame:
    """Streaming twin of the hard quality gate (quality_classifier_scores'
    keep rule): drop documents whose hashed-classifier logit
    (operators/text.py: hashed_classifier_logit_expr) is at or below
    ``threshold``. The classifier is ONE scan-shaped column expression —
    no state, no watermark, no foreachBatch needed: the same filter plans
    natively on a stream, so ingestion-time quality gating costs exactly
    what the batch pass costs per row. (The soft quality-WEIGHTED sampler
    streams the same way — its keep rule is also a pure projection.)"""
    from ..operators.text import hashed_classifier_logit_expr

    return stream.filter(
        hashed_classifier_logit_expr(F.col(text_col)) > threshold
    )


def selection_gate_expr(
    text: Column,
    *,
    gopher: bool = True,
    quality_threshold: float | None = None,
    bloom_bitmap: list[int] | None = None,
    dsir_ratios: list[float] | None = None,
    dsir_threshold: float | None = None,
    langid_model: dict[str, list[int]] | None = None,
    keep_langs: set[str] | None = None,
) -> Column:
    """ONE composed admission predicate for ingestion-time data selection
    (VERDICT r10 next #6): the Gopher rule conjunction, the hashed
    quality-classifier threshold, the Bloom novelty probe, and a DSIR
    importance-score threshold are ALL pure projections — so they compose
    into a single filter expression evaluated in one pass over the scan
    (or the micro-batch), with zero joins, zero state, zero Python.

    * ``gopher`` — Rae 2021 rule conjunction (operators/text.py:
      gopher_metrics, the same expressions the oracle-checked batch query
      runs). NULL text fails (unscoreable).
    * ``quality_threshold`` — keep iff hashed-classifier logit > t
      (operators/text.py: hashed_classifier_logit_expr).
    * ``bloom_bitmap`` — keep only documents whose content digest probes
      NEGATIVE against the reference-corpus Bloom filter
      (operators/bloom.py). This is the LOSSY Dolma-style gate: a false
      positive (engineered rate, ~1% at default sizing; ~1e-6 at
      production sizing) drops a genuinely-new document. For
      exactly-once admission semantics use dedup_gate_writer (the
      verify-join path) instead; this form is for when the verify
      exchange is the thing being avoided. NULL text probes NULL ->
      treated as new (coalesce), matching the anti-join convention.
    * ``dsir_ratios`` (+ ``dsir_threshold``) — keep iff the document's
      DSIR importance score (operators/dsir.py: dsir_score_expr over the
      broadcast log-ratio literal) exceeds the threshold: the streaming
      form of target-distribution selection (the batch sampler takes a
      global top-k, which no single-pass stream can; a score threshold
      is the standard deployment surrogate).
    * ``langid_model`` (+ ``keep_langs``) — keep iff the language-ID
      classifier (operators/langid.py, the trained weight-vector dict)
      predicts one of ``keep_langs``: CCNet's own first gate (language
      ID runs before everything else there). Scoring is the same
      literal-array projection as langid_score.
    """
    from ..operators.bloom import bloom_probe_expr
    from ..operators.dsir import dsir_score_expr
    from ..operators.text import gopher_keep_expr, hashed_classifier_logit_expr

    cond = F.lit(True)
    if langid_model is not None:
        if not keep_langs:
            raise ValueError("langid_model requires keep_langs")
        from ..operators.langid import langid_pred_expr

        cond = cond & langid_pred_expr(text, langid_model).isin(
            *sorted(keep_langs)
        )
    if gopher:
        cond = cond & F.coalesce(gopher_keep_expr(text), F.lit(False))
    if quality_threshold is not None:
        cond = cond & (
            hashed_classifier_logit_expr(text) > F.lit(float(quality_threshold))
        )
    if bloom_bitmap is not None:
        cond = cond & ~F.coalesce(
            bloom_probe_expr(F.md5(text), bloom_bitmap), F.lit(False)
        )
    if dsir_ratios is not None:
        if dsir_threshold is None:
            raise ValueError("dsir_ratios requires dsir_threshold")
        cond = cond & (
            dsir_score_expr(text, dsir_ratios) > F.lit(float(dsir_threshold))
        )
    return cond


def stream_selection_gate(
    stream: DataFrame, text_col: str = "text", **gate_kw
) -> DataFrame:
    """The composed selection gate as a native stream filter — no
    foreachBatch, no state store, no watermark: every component of
    :func:`selection_gate_expr` is a projection, so the SAME plan runs on
    a stream and on a batch (the parity the pytest pins). Per-row cost is
    exactly the batch pass's cost."""
    return stream.filter(selection_gate_expr(F.col(text_col), **gate_kw))


def selection_gate_writer(sink, text_col: str = "text", **gate_kw):
    """foreachBatch form of :func:`stream_selection_gate`, for sinks that
    need epoch semantics (idempotent writes keyed by epoch_id — the
    dedup_gate_writer calling convention): hands the ADMITTED subset of
    each micro-batch to ``sink(admitted_df, epoch_id)``. The gate itself
    is stateless, so a retried epoch re-admits exactly the same rows —
    idempotency needs only the sink's own epoch handling."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        sink(
            batch_df.filter(selection_gate_expr(F.col(text_col), **gate_kw)),
            epoch_id,
        )

    return write


def stream_dedup_against_corpus(
    stream: DataFrame, corpus: DataFrame, content_cols: list[str]
) -> DataFrame:
    """Streaming twin of ``operators.dedup.dedup_against_corpus`` (the
    unified foreachBatch entry is :func:`dedup_gate_writer`; this one
    stays a PURE stream-static anti-join — no foreachBatch needed): each
    micro-batch keeps only rows whose content digest is absent from the
    STATIC corpus — the continuous form of daily-crawl ingestion dedup
    (combine with ``dropDuplicatesWithinWatermark`` for intra-stream
    duplicates).

    Stream-static LEFT ANTI joins are natively supported by Structured
    Streaming: the static side plans once per micro-batch with no state
    store at all (nothing to watermark — the corpus is not a stream). At
    100 TB the corpus side should be its maintained digest-index table
    (16-byte digests, bucketed by digest) so each micro-batch's anti-join
    probes a sorted bucket, not the raw corpus.
    """
    from ..operators.dedup import content_digest_expr

    corpus_hashes = corpus.select(
        content_digest_expr(content_cols, corpus).alias("content_hash")
    ).distinct()
    return stream.withColumn(
        "content_hash", content_digest_expr(content_cols, stream)
    ).join(corpus_hashes, "content_hash", "left_anti")


def dedup_gate_writer(
    kind: str,
    sink,
    corpus: DataFrame | None = None,
    corpus_index=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    append_survivors: bool = False,
    stream_id: str | None = None,
    **opts,
):
    """THE unified foreachBatch admission gate (r7 VERDICT #8): one entry
    for all four dedup kinds, replacing the four ad-hoc writer signatures
    (stream_dedup_against_corpus, neardup_gate_writer,
    simhash64_gate_writer, containment_gate_writer — kept as thin
    documented aliases of the same batch operators).

    ``kind``: 'exact' | 'minhash' | 'simhash64' | 'containment'.
    ``corpus``: raw documents DataFrame — the index derivation recomputes
    per micro-batch (tests / small corpora).
    ``corpus_index``: an :class:`operators.gate_index.DedupGateIndex` (or
    its path) — the production path: each micro-batch probes the
    atomically-committed index tables instead of re-hashing the corpus.
    ``append_survivors=True`` keeps the index current from inside the
    writer: survivors go to the sink AND ``index.append(...,
    token=f"{stream_id}/{epoch_id}")``, so a retried epoch appends
    exactly once (gate_index epoch idempotency). ``stream_id`` is
    REQUIRED then (ADVICE r9): epoch ids are only unique within one
    streaming query, so two streams feeding one index under a default id
    would collide on the token and the second stream's epochs would be
    silently no-op'd — exactly the monotonically-wrong-index failure the
    token exists to prevent, inverted. Use a name stable across restarts
    of the SAME query (its checkpoint identity is the natural choice)
    and unique across queries. CHECKPOINT-RESET HAZARD: wiping a query's
    checkpoint restarts epoch ids at 0, so its new epochs re-use old
    tokens against a persisted index and are treated as already
    committed — after a checkpoint reset, change the stream_id (or start
    a fresh index).
    'containment' takes ``corpus`` alongside an (optional, accelerator)
    gram index by default — its verification reads container text, which
    belongs in the corpus table, not a copy inside an index. The
    admit-then-index wiring is supported for containment ONLY via an
    index built with ``self_corpus=True`` (gate_index module docstring):
    there grams and container text commit under the same manifest line,
    so the writer's append grows both atomically and the coverage gap
    the default layout would create is unrepresentable.

    ``opts`` per kind: content_cols (exact; default [text_col]),
    threshold/k (minhash), max_hamming (simhash64),
    gram_n/max_gram_occ (containment). For 'containment', ``corpus`` is
    required (verification reads container text) with ``corpus_index``
    (the persisted gram table) as an optional accelerator alongside it —
    UNLESS the index was built with ``self_corpus=True``, which carries
    its own container text: then pass only ``corpus_index`` (passing
    ``corpus`` too is refused — the gate must verify against exactly the
    text its grams were derived from).

    Returns a (batch_df, epoch_id) callable handing SURVIVORS (batch rows
    unchanged) to ``sink(survivors_df, epoch_id)``. Same foreachBatch
    rationale as the aliases: every kind but 'exact' needs a per-doc
    aggregation over a stream-derived join, outside pure stream-static
    shapes ('exact' also streams natively — stream_dedup_against_corpus —
    when no sink-side index maintenance is wanted).
    """
    from ..operators.dedup import (
        SHINGLE_K,
        contained_in_corpus,
        content_digest_expr,
        minhash_dedup_against_corpus,
        simhash64_dedup_against_corpus,
    )
    from ..operators.gate_index import GATE_KINDS, DedupGateIndex

    if kind not in GATE_KINDS:
        raise ValueError(f"kind={kind!r}; expected one of {sorted(GATE_KINDS)}")
    if isinstance(corpus_index, str):
        corpus_index = DedupGateIndex.open(corpus_index)
    if kind == "containment":
        if corpus_index is not None and corpus_index.effective_structural(
            "self_corpus"
        ):
            if corpus is not None:
                raise ValueError(
                    "this containment index carries its own corpus_docs "
                    "table (self_corpus=True) — passing corpus too would "
                    "verify against text its grams were not derived from"
                )
        elif corpus is None:
            raise ValueError(
                "containment verification reads container text: corpus is "
                "required (corpus_index accelerates candidates) unless the "
                "index was built with self_corpus=True"
            )
    elif (corpus is None) == (corpus_index is None):
        raise ValueError("pass exactly one of corpus / corpus_index")
    if corpus_index is not None:
        if corpus_index.kind != kind:
            raise ValueError(
                f"index at {corpus_index.path} is kind={corpus_index.kind!r}, "
                f"not {kind!r}"
            )
        # structural options are baked into the index data; an explicit
        # conflicting override here would silently gate against tables
        # built with different parameters — fail loudly instead. Compare
        # against the index's EFFECTIVE build value (defaults included):
        # an index built with the default k plus a caller passing k=9 is
        # exactly the silent mismatch this guard documents (ADVICE r8 —
        # the old `opts.get(s, opts[s])` was vacuous for absent keys).
        structural = set(opts) & DedupGateIndex._STRUCTURAL_OPTS
        for s in structural:
            built = corpus_index.effective_structural(s)
            asked = opts[s]
            if s == "content_cols":
                asked = list(asked) if asked else [text_col]
            if built != asked:
                raise ValueError(
                    f"option {s}={opts[s]!r} conflicts with the index's "
                    f"build-time {s}={built!r} ({corpus_index.path})"
                )
        gate_opts = {
            k_: v for k_, v in opts.items()
            if k_ in DedupGateIndex._GATE_OPTS
        }

    def survivors_of(batch_df: DataFrame) -> DataFrame:
        if corpus_index is not None:
            if kind == "containment":
                return corpus_index.gate(batch_df, corpus_docs=corpus, **gate_opts)
            return corpus_index.gate(batch_df, **gate_opts)
        if kind == "exact":
            cols = opts.get("content_cols") or [text_col]
            hashes = corpus.select(
                content_digest_expr(cols, corpus).alias("__gate_hash")
            ).distinct()
            return (
                batch_df.withColumn(
                    "__gate_hash", content_digest_expr(cols, batch_df)
                )
                .join(hashes, "__gate_hash", "left_anti")
                .drop("__gate_hash")
            )
        if kind == "minhash":
            return minhash_dedup_against_corpus(
                batch_df, corpus, id_col=id_col, text_col=text_col,
                threshold=opts.get("threshold", 0.4),
                k=opts.get("k", SHINGLE_K),
            )
        if kind == "simhash64":
            return simhash64_dedup_against_corpus(
                batch_df, corpus, id_col=id_col, text_col=text_col,
                max_hamming=opts.get("max_hamming", 3),
            )
        return contained_in_corpus(
            batch_df, corpus, id_col=id_col, text_col=text_col,
            gram_n=opts.get("gram_n", 16),
            max_gram_occ=opts.get("max_gram_occ", 10_000),
        )

    if append_survivors and corpus_index is None:
        raise ValueError(
            "append_survivors maintains a persisted index: pass corpus_index"
        )
    if (
        append_survivors
        and kind == "containment"
        and not corpus_index.effective_structural("self_corpus")
    ):
        # growing the gram index per epoch WITHOUT growing corpus_docs
        # creates exactly the coverage violation gate(assert_coverage=True)
        # exists to catch: an indexed container whose text is missing
        # silently ADMITS its duplicates. Supported shape: an index built
        # with self_corpus=True, whose append commits grams AND container
        # text under one manifest line.
        raise ValueError(
            "append_survivors is unsupported for kind='containment' on a "
            "default-layout index: the writer cannot also grow "
            "corpus_docs, and an index/corpus coverage gap silently "
            "admits duplicates — build the index with self_corpus=True "
            "(grams + container text commit atomically) or maintain both "
            "in the sink transaction and gate with assert_coverage=True"
        )
    if append_survivors and stream_id is None:
        # epoch ids are per-query: a default shared stream_id would make
        # two streams (or a checkpoint-reset restart) collide on the
        # idempotency token and silently no-op real epochs (ADVICE r9 —
        # docstring: stream_id contract / checkpoint-reset hazard)
        raise ValueError(
            "append_survivors=True requires an explicit stream_id: the "
            "index idempotency token is f'{stream_id}/{epoch_id}', and "
            "epoch ids are only unique within one streaming query"
        )

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        survivors = survivors_of(batch_df)
        if append_survivors:
            # admit-then-index in one writer (the production wiring the
            # docstring describes): survivors land in the sink AND the
            # index, keyed by the foreachBatch epoch so a RETRIED epoch
            # re-runs the sink (which must be idempotent anyway — the
            # foreachBatch contract) but appends to the index exactly
            # once (gate_index epoch idempotency). Persist so the gate
            # computation isn't executed twice for sink + append.
            survivors.persist()
            try:
                sink(survivors, epoch_id)
                corpus_index.append(
                    survivors, token=f"{stream_id}/{epoch_id}"
                )
            finally:
                survivors.unpersist()
        else:
            sink(survivors, epoch_id)

    return write


def neardup_gate_writer(
    corpus: DataFrame,
    sink,
    threshold: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch writer running the NEAR-dup admission gate on a document
    stream (kept as the documented minhash alias of
    :func:`dedup_gate_writer`): each micro-batch keeps only docs with no LSH-candidate
    near-duplicate (exact jaccard ≥ threshold) in the static corpus, then
    hands the survivors to ``sink(survivors_df, epoch_id)``.

    Why foreachBatch and not a pure streaming plan: the gate's survivor set
    is "docs where NO banded candidate verified", which needs a per-doc
    aggregation over a stream-derived join — outside Structured Streaming's
    supported stream-static shapes. foreachBatch gives each micro-batch
    full batch semantics (the exact operator batch pipelines run —
    operators/dedup.minhash_dedup_against_corpus), and with a checkpointed
    query + idempotent sink the usual effectively-once contract holds.
    The exact-hash twin (stream_dedup_against_corpus) stays a pure
    stream-static anti-join because its survivor predicate is per-row.

    At 100 TB pass the maintained signature index — the (bands, shingles)
    tuple from ``operators.dedup.load_neardup_index`` — as ``corpus``:
    each micro-batch then probes the index tables instead of recomputing
    corpus signatures (and ``append_to_neardup_index`` with each batch's
    survivors keeps the index current).
    """
    from ..operators.dedup import minhash_dedup_against_corpus

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        if isinstance(corpus, tuple):
            survivors = minhash_dedup_against_corpus(
                batch_df,
                corpus_index=corpus,
                id_col=id_col,
                text_col=text_col,
                threshold=threshold,
            )
        else:
            survivors = minhash_dedup_against_corpus(
                batch_df, corpus, id_col=id_col, text_col=text_col, threshold=threshold
            )
        sink(survivors, epoch_id)

    return write


def simhash64_gate_writer(
    corpus=None,
    sink=None,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_index: DataFrame | None = None,
):
    """The simhash64 twin of :func:`neardup_gate_writer` (r6 VERDICT item
    8; kept as the documented alias of :func:`dedup_gate_writer`): each micro-batch keeps only docs with no corpus document at 64-bit
    SimHash Hamming ≤ ``max_hamming``, then hands survivors to
    ``sink(survivors_df, epoch_id)``. Same foreachBatch rationale (the
    survivor predicate aggregates over a stream-derived join).

    Pass a raw documents DataFrame as ``corpus`` (signatures recomputed
    per batch — tests/small corpora) or the persisted block-index
    DataFrame from ``operators.dedup.load_simhash64_index`` as
    ``corpus_index`` — the production path: each micro-batch's only
    shuffle keys on the 4 (blk, bval) probes against the index's
    clustering, and ``append_to_simhash64_index`` with each batch's
    survivors keeps the index current. The explicit keyword mirrors
    ``simhash64_dedup_against_corpus``'s unambiguous API (ADVICE r7: the
    old columns-present duck-typing would silently treat a raw documents
    frame that happens to carry sig/blk/bval columns as an index); a
    prebuilt index passed positionally is still recognized, but only by
    the EXACT 4-column integer layout ``_simhash64_block_rows`` emits.
    """
    from ..operators.dedup import simhash64_dedup_against_corpus

    if corpus is not None and corpus_index is not None:
        raise ValueError("pass corpus OR corpus_index, not both")
    if corpus is None and corpus_index is None:
        raise ValueError("one of corpus / corpus_index is required")

    def _is_index(df: DataFrame) -> bool:
        # exact layout check: the 4 columns of _simhash64_block_rows with
        # integer types (sig/bval LongType, blk IntegerType), nothing else
        d = dict(df.dtypes)
        return (
            set(df.columns) == {id_col, "sig", "blk", "bval"}
            and d.get("sig") == "bigint"
            and d.get("blk") == "int"
            and d.get("bval") == "bigint"
        )

    index = corpus_index if corpus_index is not None else (
        corpus if _is_index(corpus) else None
    )

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        kwargs = dict(id_col=id_col, text_col=text_col, max_hamming=max_hamming)
        if index is not None:
            survivors = simhash64_dedup_against_corpus(
                batch_df, corpus_index=index, **kwargs
            )
        else:
            survivors = simhash64_dedup_against_corpus(batch_df, corpus, **kwargs)
        sink(survivors, epoch_id)

    return write


def containment_gate_writer(
    corpus: DataFrame,
    sink,
    gram_n: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The containment twin of :func:`neardup_gate_writer` (kept as the
    documented alias of :func:`dedup_gate_writer`): each micro-batch
    keeps only docs whose full text is NOT a verbatim substring of some
    longer corpus doc (operators/dedup.py: contained_in_corpus — the
    fragment-of-existing-page ingestion rule), then hands survivors to
    ``sink(survivors_df, epoch_id)``. Same foreachBatch rationale: the
    survivor predicate aggregates over a stream-derived join. At 100 TB,
    persist the corpus aligned-gram table and swap it in here instead of
    recomputing per batch (verification still reads corpus text for
    candidate containers only — see the operator docstring)."""
    from ..operators.dedup import contained_in_corpus

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        survivors = contained_in_corpus(
            batch_df, corpus, gram_n=gram_n, id_col=id_col, text_col=text_col
        )
        sink(survivors, epoch_id)

    return write


# ---------------------------------------------------------------------------
# The streaming decision aggregate
# ---------------------------------------------------------------------------
def _cmp_recent_first(x: Column, y: Column) -> Column:
    """array_sort comparator: ts_us DESC, signal_id DESC (the deterministic
    'most recent first' total order, SURVEY.md §7.4.1)."""
    return (
        F.when(x["ts_us"] > y["ts_us"], -1)
        .when(x["ts_us"] < y["ts_us"], 1)
        .when(x["signal_id"] > y["signal_id"], -1)
        .when(x["signal_id"] < y["signal_id"], 1)
        .otherwise(0)
    )


def _dec_sum(arr: Column, field: str) -> Column:
    """Near-exact left-fold sum of a struct field on decimals.

    Decimal addition widens (38,10)+(38,10)->(38,9), so the fold re-casts the
    accumulator each step — each add can round at the 9th decimal (~1e-9
    absolute), which is deterministic and invisible at the pipeline's 6-dp
    outputs. (True exactness would need Spark's two-level streaming
    aggregation — see the module docstring's scale note.)"""
    return F.aggregate(
        arr,
        F.lit(0).cast(DEC),
        lambda acc, x: (acc + x[field].cast(DEC)).cast(DEC),
    ).cast("double")


def _tf_cols(
    sorted_sigs: Column, tf: str, ext: tuple[Column, Column] | None = None
) -> dict[str, Column]:
    """Per-timeframe stats from the sorted signal array.

    ``ext`` (cnt_all, balance) supplies the untrimmed whole-window counters
    externally — used by the bounded-state path, where ``sorted_sigs`` holds
    only the last-10 buffers and the untrimmed quantities (A4 balance, A6's
    min(count,10)) live in O(1) running counters instead of the array.
    """
    tf_arr = F.filter(sorted_sigs, lambda s: s["timeframe"] == tf)
    buf = F.slice(tf_arr, 1, BUFFER_KEEP)  # already recent-first
    n_buf = F.size(buf)
    sum_p = _dec_sum(buf, "price")
    sum_p2 = F.aggregate(
        buf,
        F.lit(0).cast(DEC),
        lambda acc, x: (acc + (x["price"] * x["price"]).cast(DEC)).cast(DEC),
    ).cast("double")
    mean_p = sum_p / n_buf
    nbuy = F.size(F.filter(buf, lambda s: s["side"] == "BUY"))
    if ext is None:
        cnt_all = F.size(tf_arr)
        balance = F.aggregate(
            tf_arr,
            F.lit(0),
            lambda acc, x: acc + F.when(x["side"] == "BUY", 1).otherwise(-1),
        )
    else:
        cnt_all, balance = ext
    return {
        "present": cnt_all > 0,
        "cnt_all": cnt_all,
        "balance": balance,
        "avg_price": mean_p,
        "vol": F.when(n_buf < 2, F.lit(0.0)).otherwise(
            F.sqrt(F.greatest(sum_p2 / n_buf - mean_p * mean_p, F.lit(0.0)))
        ),
        # majority side over the buffer; tie → 'SELL' (lexicographic max,
        # matching the batch ORDER BY c DESC, side DESC tie-break)
        "maj": F.when(nbuy * 2 > n_buf, "BUY").otherwise("SELL"),
        "n_kept": F.least(cnt_all, F.lit(BUFFER_KEEP)),
    }


def decisions_from_signal_array(
    agg: DataFrame,
    round_dp: int = 6,
    per_tf_counts: dict[str, tuple[Column, Column]] | None = None,
) -> DataFrame:
    """Finishing projection: (symbol, window_start_s, sigs array) → decision.

    Pure array expressions — computed identically in streaming and batch; the
    semantics mirror operators.signal_pipeline.decide (A2-A10, D1-D5, P5).

    ``per_tf_counts`` maps timeframe → (cnt_all, balance) columns for the
    bounded-state path where ``sigs`` holds only the per-timeframe last-10
    buffers (the untrimmed counters travel as scalar columns).
    """
    out = agg.withColumn("sorted_sigs", F.array_sort("sigs", _cmp_recent_first))

    tfs = ["1m", "5m", "15m"]
    per_tf = {
        tf: _tf_cols(
            F.col("sorted_sigs"),
            tf,
            per_tf_counts.get(tf) if per_tf_counts else None,
        )
        for tf in tfs
    }

    n_timeframes = sum(
        (F.when(per_tf[tf]["present"], 1).otherwise(0) for tf in tfs), F.lit(0)
    )
    balance = sum((per_tf[tf]["balance"] for tf in tfs), F.lit(0))
    n_signals = sum(
        (F.when(per_tf[tf]["present"], per_tf[tf]["n_kept"]).otherwise(0) for tf in tfs),
        F.lit(0),
    )
    sum_avg = sum(
        (
            F.when(per_tf[tf]["present"], per_tf[tf]["avg_price"].cast(DEC)).otherwise(
                F.lit(0).cast(DEC)
            )
            for tf in tfs
        ),
        F.lit(0).cast(DEC),
    )
    sum_vol = sum(
        (
            F.when(per_tf[tf]["present"], per_tf[tf]["vol"].cast(DEC)).otherwise(
                F.lit(0).cast(DEC)
            )
            for tf in tfs
        ),
        F.lit(0).cast(DEC),
    )
    avg_price = sum_avg.cast("double") / n_timeframes
    avg_vol = sum_vol.cast("double") / n_timeframes

    majs = F.array_distinct(
        F.filter(
            F.array(
                *[
                    F.when(per_tf[tf]["present"], per_tf[tf]["maj"]).otherwise(
                        F.lit(None)
                    )
                    for tf in tfs
                ]
            ),
            lambda m: m.isNotNull(),
        )
    )
    alignment = F.when(F.size(majs) == 1, F.lit(1.0)).otherwise(F.lit(0.5))

    # top-5 most recent across the per-timeframe buffers (A7/D5).
    # (closure factory, not a defaulted lambda — PySpark would read a
    # two-parameter lambda as (element, index))
    def _is_tf(tf: str):
        def f(s: Column) -> Column:
            return s["timeframe"] == tf

        return f

    buffers = F.flatten(
        F.array(
            *[
                F.slice(F.filter(F.col("sorted_sigs"), _is_tf(tf)), 1, BUFFER_KEEP)
                for tf in tfs
            ]
        )
    )
    top5 = F.slice(F.array_sort(buffers, _cmp_recent_first), 1, TOP_RECENT)
    qty_recent = _dec_sum(top5, "qty") / F.size(top5)

    enriched = (
        out.withColumn("n_timeframes", n_timeframes.cast("long"))
        .withColumn("balance", balance.cast("long"))
        .withColumn("n_signals", n_signals.cast("long"))
        .withColumn("avg_price", avg_price)
        .withColumn("avg_volatility", avg_vol)
        .withColumn("alignment", alignment)
        .withColumn("qty_recent", qty_recent)
        .filter(F.col("n_timeframes") >= 2)  # P5 HAVING
    )

    bal = F.col("balance")
    action = (
        F.when(bal > 5, "STRONG_BUY")
        .when(bal > 2, "BUY")
        .when(bal < -5, "STRONG_SELL")
        .when(bal < -2, "SELL")
        .otherwise("HOLD")
    )
    enriched = enriched.withColumn("action", action)
    mult = (
        F.when(F.col("action") == "STRONG_BUY", PRICE_MULT["STRONG_BUY"])
        .when(F.col("action") == "BUY", PRICE_MULT["BUY"])
        .when(F.col("action") == "SELL", PRICE_MULT["SELL"])
        .when(F.col("action") == "STRONG_SELL", PRICE_MULT["STRONG_SELL"])
        .otherwise(F.lit(1.0))
    )
    confidence = F.least(
        F.lit(1.0),
        F.col("alignment") * 0.4
        + F.least(F.lit(1.0), F.abs(bal) / 10.0) * 0.4
        + F.greatest(F.lit(0.3), F.lit(1.0) - F.col("avg_volatility") / 100.0) * 0.2,
    )
    reason = (
        F.when(
            F.col("action").startswith("STRONG"),
            F.when(F.col("alignment") > 0.8, "ALIGNED_SIGNALS").otherwise(
                "MOMENTUM_SHIFT"
            ),
        )
        .when(F.col("action").isin("BUY", "SELL"), "ALIGNED_SIGNALS")
        .otherwise(
            F.when(F.col("alignment") < 0.6, "DIVERGENT_SIGNALS").otherwise(
                "INSUFFICIENT_DATA"
            )
        )
    )
    is_hold = F.col("action") == "HOLD"
    return enriched.select(
        "symbol",
        F.col("window_start_s").cast("long").alias("window_start_s"),
        "n_timeframes",
        "n_signals",
        "balance",
        F.round("avg_price", round_dp).alias("avg_price"),
        "alignment",
        F.round("avg_volatility", round_dp).alias("avg_volatility"),
        "action",
        F.when(is_hold, F.lit(0.5)).otherwise(F.round(confidence, round_dp)).alias(
            "confidence"
        ),
        F.round(F.col("avg_price") * mult, round_dp).alias("suggested_price"),
        F.when(is_hold, F.lit(0.0))
        .otherwise(F.floor(F.col("qty_recent") * 10000) / 10000.0)
        .alias("suggested_qty"),
        reason.alias("reason"),
    )


def streaming_sessionize(
    signals: DataFrame,
    gap: str = "30 seconds",
    watermark: str = "0 seconds",
) -> DataFrame:
    """T4 session windows (absent in the reference, free in Spark): per-symbol
    activity sessions that close after `gap` of silence.

    ``session_window`` is a merging stateful aggregation — state per key is
    one open session, not the member rows, so it scales with |symbols|, not
    row count. Append mode emits a session once the watermark passes its end.
    """
    sig = signals.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    return (
        sig.withWatermark("event_time", watermark)
        .groupBy("symbol", F.session_window("event_time", gap))
        .agg(
            F.count(F.lit(1)).alias("n_signals"),
            _dec_sum_plain(F.col("price")).alias("sum_price"),
        )
        .select(
            "symbol",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start_s"),
            F.unix_timestamp(F.col("session_window.end")).alias("session_end_s"),
            "n_signals",
            "sum_price",
        )
    )


def _dec_sum_plain(col: Column) -> Column:
    return F.sum(col.cast(DEC)).cast("double")


def arrival_order_last10(
    signals: DataFrame,
    window_seconds: int = WINDOW_SECONDS,
    keep: int = BUFFER_KEEP,
) -> DataFrame:
    """BIT-EXACT arrival-order last-N buffer as a custom stateful operator.

    The engine's default path re-specifies the reference's FIFO-by-arrival
    buffer (SignalAggregator.kt:16-23) to ts-order (SURVEY.md §7.4.1) because
    arrival order is not reproducible under repartitioning. When strict
    arrival semantics ARE required, this operator provides them:
    ``applyInPandasWithState`` keyed by (symbol, window_start_s, timeframe),
    state = the last `keep` (price, ts_us) pairs in processing order, emitted
    per trigger (update semantics — mirrors the reference's per-commit
    cadence, T2).

    Scale: Arrow-batched, state bounded at `keep` rows per key, one shuffle on
    the group key. Arrival order within a micro-batch follows source row
    order per partition — exactly as far as the reference's own guarantee
    goes (Kafka preserves order per partition only).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "symbol string, window_start_s long, timeframe string, "
        "n_buffered int, avg_price double, newest_ts_us long"
    )
    state_schema = "prices array<double>, tss array<long>"

    def update(key, pdfs, state: GroupState):
        if state.exists:
            prices, tss = state.get
            prices, tss = list(prices), list(tss)
        else:
            prices, tss = [], []
        for pdf in pdfs:
            for p, t in zip(pdf["price"], pdf["ts_us"]):
                prices.append(float(p))
                tss.append(int(t))
                if len(prices) > keep:  # FIFO eviction (SignalAggregator.kt:19-21)
                    prices.pop(0)
                    tss.pop(0)
        state.update((prices, tss))
        symbol, window_start_s, timeframe = key
        yield pd.DataFrame(
            [
                {
                    "symbol": symbol,
                    "window_start_s": window_start_s,
                    "timeframe": timeframe,
                    "n_buffered": len(prices),
                    "avg_price": sum(prices) / len(prices) if prices else 0.0,
                    "newest_ts_us": tss[-1] if tss else 0,
                }
            ]
        )

    w_us = window_seconds * 1_000_000
    keyed = signals.withColumn(
        "window_start_s", F.expr(f"(ts_us div {w_us}) * {window_seconds}").cast("long")
    )
    return keyed.groupBy("symbol", "window_start_s", "timeframe").applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def streaming_decide(
    signals: DataFrame,
    window_seconds: int = WINDOW_SECONDS,
    watermark: str = "0 seconds",
    dedup: bool = False,
) -> DataFrame:
    """signals stream → decision stream (append mode semantics).

    One stateful windowed aggregation; zero-grace watermark drops late rows
    exactly like TimeWindows.ofSizeWithNoGrace (SignalTopology.kt:52).
    """
    sig = signals.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    sig = sig.withWatermark("event_time", watermark)
    if dedup:
        sig = dedup_signals(sig)
    agg = (
        sig.groupBy("symbol", F.window("event_time", f"{window_seconds} seconds"))
        .agg(
            F.collect_list(
                F.struct("ts_us", "signal_id", "side", "qty", "price", "timeframe")
            ).alias("sigs")
        )
        .withColumn("window_start_s", F.unix_timestamp(F.col("window.start")))
        .drop("window")
    )
    return decisions_from_signal_array(agg)


def streaming_candles(
    signals: DataFrame,
    candle_seconds: int = 60,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming OHLCV twin of ``plans.registry.q_ohlcv_candles``: the same
    per-(symbol, minute) candle columns from a signal STREAM — one
    watermarked windowed aggregation, append semantics (a candle emits once
    its window passes the watermark, the exactly-the-exchange-feed shape).

    open/close use ``min_by``/``max_by`` over the unique (ts_us, signal_id)
    order — the declarative equivalent of the batch query's rank windows
    (streaming aggregations cannot rank, but argmin/argmax state is O(1)
    per group, which is also the better shape at scale). Volume/VWAP run
    the identical DECIMAL(38,10) expressions, so streaming == batch
    EXACTLY (pinned by tests/test_streaming.py).
    """
    sig = signals.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    sig = sig.withWatermark("event_time", watermark)
    return (
        sig.groupBy("symbol", F.window("event_time", f"{candle_seconds} seconds"))
        .agg(
            F.expr("min_by(price, struct(ts_us, signal_id))").alias("open"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.expr("max_by(price, struct(ts_us, signal_id))").alias("close"),
            F.expr("CAST(sum(CAST(qty AS DECIMAL(38,10))) AS DOUBLE)").alias("volume"),
            F.expr(
                "round(CAST(sum(CAST(price * qty AS DECIMAL(38,10))) AS DOUBLE)"
                " / CAST(sum(CAST(qty AS DECIMAL(38,10))) AS DOUBLE), 6)"
            ).alias("vwap"),
            F.count(F.lit(1)).cast("long").alias("n_trades"),
        )
        .withColumn("bucket_s", F.unix_timestamp(F.col("window.start")))
        .drop("window")
    )


_TFS = ("1m", "5m", "15m")
_BOUNDED_OUT_SCHEMA = (
    "symbol string, window_start_s long, "
    "ts_us array<long>, signal_id array<long>, side array<string>, "
    "qty array<double>, price array<double>, timeframe array<string>, "
    "cnt_1m long, bal_1m long, cnt_5m long, bal_5m long, cnt_15m long, bal_15m long"
)
_BOUNDED_STATE_SCHEMA = (
    "tss array<long>, ids array<long>, sides array<string>, qtys array<double>, "
    "prices array<double>, tfs array<string>, "
    "c1 long, b1 long, c5 long, b5 long, c15 long, b15 long"
)
_BOUNDED_OUT_COLS = [
    "symbol", "window_start_s", "ts_us", "signal_id", "side", "qty", "price",
    "timeframe", "cnt_1m", "bal_1m", "cnt_5m", "bal_5m", "cnt_15m", "bal_15m",
]


def _make_bounded_update(window_seconds: int, keep: int):
    """Build the applyInPandasWithState update fn for the bounded decide path.

    State per (symbol, window_start_s) key is the trimmed per-timeframe
    last-``keep`` buffers (≤ 3×keep rows, column-major arrays) plus six O(1)
    counters — the untrimmed count and buy/sell balance per timeframe
    (A4/A6's whole-window quantities). This mirrors the reference's own state
    shape (SignalAggregator.kt:16-23 keeps only the last-10 buffers and
    running counters, never the raw window), where the default windowed-agg
    path's collect_list state grows with ingest rate.
    """
    import pandas as pd  # noqa: PLC0415 — closure ships to workers

    def update(key, pdfs, state):
        symbol, window_start_s = key
        end_ms = (int(window_start_s) + window_seconds) * 1000

        if state.hasTimedOut:
            # Watermark passed window end: emit the partial once (append
            # semantics, T1), drop state.
            (tss, ids, sides, qtys, prices, tfs, c1, b1, c5, b5, c15, b15) = state.get
            state.remove()
            yield pd.DataFrame(
                [[symbol, int(window_start_s), list(tss), list(ids), list(sides),
                  list(qtys), list(prices), list(tfs), c1, b1, c5, b5, c15, b15]],
                columns=_BOUNDED_OUT_COLS,
            )
            return

        if not state.exists and end_ms <= state.getCurrentWatermarkMs():
            # Entirely-late window (already emitted or never will be): drop —
            # the zero-grace late-row semantics of the windowed-agg path (T3).
            return

        if state.exists:
            st = state.get
            buf = list(zip(st[0], st[1], st[2], st[3], st[4], st[5]))
            counters = list(st[6:12])
        else:
            buf, counters = [], [0, 0, 0, 0, 0, 0]

        for pdf in pdfs:
            for t, i, s, q, p, tf in zip(
                pdf["ts_us"], pdf["signal_id"], pdf["side"], pdf["qty"],
                pdf["price"], pdf["timeframe"],
            ):
                if tf not in _TFS:
                    # Unknown timeframe on the wire (well-formed JSON, bad
                    # enum): drop the row, matching the windowed-agg path's
                    # silent tolerance. Raising here would make one poison
                    # message crash the query on every checkpoint restart.
                    continue
                j = _TFS.index(tf)
                counters[2 * j] += 1
                counters[2 * j + 1] += 1 if s == "BUY" else -1
                buf.append((int(t), int(i), str(s), float(q), float(p), str(tf)))

        # Re-trim: keep the ``keep`` most-recent per timeframe by
        # (ts_us desc, signal_id desc) — the engine's deterministic re-spec
        # of the reference's arrival-order FIFO (SURVEY.md §7.4.1).
        trimmed: list[tuple] = []
        for tf in _TFS:
            rows_tf = [r for r in buf if r[5] == tf]
            rows_tf.sort(key=lambda r: (r[0], r[1]), reverse=True)
            trimmed.extend(rows_tf[:keep])

        state.update((
            [r[0] for r in trimmed], [r[1] for r in trimmed],
            [r[2] for r in trimmed], [r[3] for r in trimmed],
            [r[4] for r in trimmed], [r[5] for r in trimmed],
            *counters,
        ))
        # Emit when the watermark passes window end. max() keeps a retried /
        # straggler batch from setting a timestamp the watermark already
        # passed (illegal) — the window then closes at the next watermark
        # advance instead of crashing the query.
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))

    return update


def streaming_decide_bounded(
    signals: DataFrame,
    window_seconds: int = WINDOW_SECONDS,
    watermark: str = "0 seconds",
) -> DataFrame:
    """signals stream → decision stream with BOUNDED per-key state.

    The 100 TB/day variant of :func:`streaming_decide`: the default path's
    single windowed aggregation collects every signal of a (symbol, window)
    group into state, so per-key state grows with ingest rate — the one
    scale hazard the module docstring names. This path replaces it with a
    custom stateful operator (``applyInPandasWithState``, event-time timeout)
    whose state per key is ≤ 3×BUFFER_KEEP buffer rows + 6 counters
    regardless of rate, exactly mirroring the reference's own state shape
    (SignalAggregator.kt:16-23 keeps only the last-10 buffers and running
    counters, never the raw window).

    The finishing math is the SAME JVM array expressions as the default path
    (decisions_from_signal_array) — the Python side only maintains buffers
    and counters; per-timeframe stats, thresholds, and the decision CASEs all
    run as Catalyst expressions on the emitted partials — so results match
    streaming_decide / batch ``decide`` (asserted row-for-row in
    tests/test_streaming.py).

    Emission contract: one row per (symbol, window) when the watermark passes
    the window end (append semantics, zero-grace late drops — T1/T3), same as
    the windowed-agg path. Run it on the RocksDB state store provider (T5)
    like any other stateful query.

    (Spark ≥4.0's transformWithStateInPandas could express the same operator
    with typed ListState/ValueState + timers; it needs the protobuf runtime,
    absent in this container, so the engine standardizes on the
    applyInPandasWithState form — same state shape, executable everywhere.)
    """
    from pyspark.sql.streaming.state import GroupStateTimeout  # noqa: PLC0415

    sig = signals.withColumn("event_time", F.timestamp_micros(F.col("ts_us")))
    sig = sig.withWatermark("event_time", watermark)
    w_us = window_seconds * 1_000_000
    keyed = sig.withColumn(
        "window_start_s",
        F.expr(f"(ts_us div {w_us}) * {window_seconds}").cast("long"),
    )
    partials = keyed.groupBy("symbol", "window_start_s").applyInPandasWithState(
        _make_bounded_update(window_seconds, BUFFER_KEEP),
        _BOUNDED_OUT_SCHEMA,
        _BOUNDED_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    # Re-assemble the array<struct> shape the finishing expressions consume;
    # arrays_zip names struct fields after the source columns.
    with_sigs = partials.select(
        "symbol",
        "window_start_s",
        F.arrays_zip(
            "ts_us", "signal_id", "side", "qty", "price", "timeframe"
        ).alias("sigs"),
        *[c for c in _BOUNDED_OUT_COLS[8:]],
    )
    return decisions_from_signal_array(
        with_sigs,
        per_tf_counts={
            tf: (F.col(f"cnt_{tf}"), F.col(f"bal_{tf}")) for tf in _TFS
        },
    )


def stream_stream_click_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    window_minutes: int = 30,
) -> DataFrame:
    """Stream-stream inner join: clicks within the `window_minutes` before
    each purchase by the same user (the streaming twin of the batch
    `range_join_click_attribution` query).

    Beyond-reference streaming surface (the reference joins only
    stream-to-constant-map — SignalTopology.kt:76); Spark's watermarked
    stream-stream join is the engine capability that replaces it at scale.

    State-bound reasoning (what makes this safe on an unbounded stream):
    both sides carry a watermark and the join condition constrains the two
    event times to a bounded range, so Spark derives a state-eviction bound
    for each side — click state older than (purchase watermark -
    window_minutes) and purchase state older than the click watermark are
    dropped, keeping state O(window x rate) regardless of stream age.

    Expected columns: purchases(event_id, user_id, event_time),
    clicks(user_id, event_time, value).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("event_time").alias("p_time"),
    ).withWatermark("p_time", "1 minute")
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_time").alias("c_time"),
        F.col("value").alias("click_value"),
    ).withWatermark("c_time", f"{window_minutes + 1} minutes")
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_time") >= F.col("p_time") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
        & (F.col("c_time") < F.col("p_time"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "p_user", "p_time", "c_time", "click_value"
    )
