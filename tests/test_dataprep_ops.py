"""Behavioral tests for the training-data-pipeline operators that have no
SQL oracle (ANN recall, multimodal plumbing, dedup invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.dedup import (
    jaccard_expr,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    with_minhash,
)
from futures_eos_cdc_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    _frame_sample_bytes as frame_sample_bytes,
)
from futures_eos_cdc_spark.operators.similarity import (
    ann_topk_ivf,
    ann_topk_lsh,
    brute_force_topk,
)
from futures_eos_cdc_spark.operators.text import shingles_expr, tokens_expr


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_ann_recall_vs_brute_force(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20)
    exact = {
        (r.q_id, r.c_id) for r in brute_force_topk(e, q, k=3).collect()
    }
    approx = {(r.q_id, r.c_id) for r in ann_topk_lsh(e, q, k=3).collect()}
    recall = len(exact & approx) / len(exact)
    # The fixture has NO planted near-duplicates (top cosine ~0.3-0.48, i.e.
    # ~70deg angles) — the hardest regime for hyperplane LSH. 10 tables x 5
    # bits gives ~0.5 theoretical recall here; on a real near-dup corpus
    # (cosine >= 0.9) the same config recalls ~1.0 with far fewer candidates.
    assert recall >= 0.4, f"ANN recall too low: {recall:.2f}"
    # every approx hit must be a real (non-self) pair
    assert all(a != b for a, b in approx)


def test_ann_cosines_are_exact_for_returned_pairs(spark, sf_dir):
    # ANN may miss neighbors but must never mis-score the ones it returns.
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.q_id, r.c_id): r.cosine for r in brute_force_topk(e, q, k=500).collect()
    }
    for r in ann_topk_lsh(e, q, k=3).collect():
        assert abs(exact[(r.q_id, r.c_id)] - r.cosine) < 1e-12


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20)
    exact = {(r.q_id, r.c_id) for r in brute_force_topk(e, q, k=3).collect()}
    approx = {
        (r.q_id, r.c_id) for r in ann_topk_ivf(e, q, k=3, nprobe=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    # The fixture's embeddings are near-random (max pairwise cosine ~0.48),
    # so IVF recall tracks the probed fraction: nprobe=8/16 measures 0.83.
    # (The pre-r7 Gaussian init scored 1.0 at nprobe=4 — an artifact: init
    # collapse left a handful of occupied cells, so probing 4 of them WAS
    # a near-full scan. Real clustering costs that fake recall.)
    assert recall >= 0.8, f"IVF recall too low: {recall:.2f}"
    assert all(a != b for a, b in approx)


def test_ivf_data_sampled_init_occupies_every_cell(spark, sf_dir):
    """The invariant that broke at the 100x corpus: Gaussian-init k-means
    left 9 of 6250 cells occupied (57k-member cells -> quadratic SemDeDup,
    near-full-scan IVF). Data-sampled init must keep every cell live."""
    from futures_eos_cdc_spark.operators.similarity import ivf_assign, ivf_train

    e = _emb(spark, sf_dir)
    cents = ivf_train(e, n_cells=16, iters=2)
    occ = ivf_assign(e, cents).groupBy("cell").count().collect()
    assert len(occ) == 16
    assert max(r["count"] for r in occ) <= 500 * 0.5  # no collapsed mega-cell


def test_ngram_jaccard_prefix_filter_is_exact(spark, sf_dir):
    """Prefix filtering must equal brute-force all-pairs — NO false negatives
    (that's its contract, unlike MinHash-LSH)."""
    d = _docs(spark, sf_dir)
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(d, threshold=0.7).collect()
    }
    base = d.select(
        F.col("doc_id"), shingles_expr(tokens_expr(F.col("text")), 3).alias("sh")
    )
    a = base.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = base.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.round(jaccard_expr(F.col("sh_a"), F.col("sh_b")), 6))
        .filter(F.col("jaccard") >= 0.7)
    )
    want = {(r.doc_a, r.doc_b, r.jaccard) for r in brute.collect()}
    assert got == want
    assert len(got) > 0


def test_minhash_pairs_symmetric_and_thresholded(spark, sf_dir):
    pairs = minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.4).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= 0.4


def test_minhash_identical_docs_have_identical_signatures(spark, sf_dir):
    d = _docs(spark, sf_dir).limit(20)
    sig1 = with_minhash(d.select("doc_id", "text")).select("doc_id", "mh0", "mh7")
    sig2 = with_minhash(d.select("doc_id", "text")).select("doc_id", "mh0", "mh7")
    assert sorted(map(tuple, sig1.collect())) == sorted(map(tuple, sig2.collect()))


def test_multimodal_decode_schema_and_determinism(spark, sf_dir):
    mm = attach_binary(_docs(spark, sf_dir).limit(50))
    f1 = decode_features(mm).collect()
    f2 = decode_features(mm).collect()
    assert sorted(r.doc_id for r in f1) == sorted(r.doc_id for r in f2)
    by_id = {r.doc_id: r for r in f1}
    for r in f2:
        a = by_id[r.doc_id]
        assert a.sha256_8 == r.sha256_8
        assert a.features == r.features
        assert len(r.features) == 4
        assert r.n_bytes > 0


def test_multimodal_resize_is_real_and_frame_sample_shapes(spark, sf_dir):
    """resize_media actually transforms payload bytes (r5 VERDICT wrong #4:
    no more metadata-only public stub): the Spark-side result decodes to
    the target shape and byte-equals the local resize_ppm; non-PPM input
    is rejected loudly."""
    import pytest as _pytest

    from futures_eos_cdc_spark.operators.multimodal import (
        attach_synthetic_media,
        decode_ppm,
        resize_media,
        resize_ppm,
    )

    docs = _docs(spark, sf_dir).limit(20)
    media = attach_synthetic_media(docs)
    ppm = media.filter("format = 'image/ppm'")
    local = {r.doc_id: resize_ppm(bytes(r.payload), 32, 24) for r in ppm.collect()}
    got = {r.doc_id: bytes(r.payload) for r in resize_media(ppm, 32, 24).collect()}
    assert got == local and len(got) > 0
    for p in got.values():
        assert decode_ppm(p).shape == (24, 32, 3)
    with _pytest.raises(Exception, match="unsupported format"):
        resize_media(media.filter("format = 'audio/wav'"), 32, 24).collect()

    mm = attach_binary(docs.limit(10))
    frames = frame_sample_bytes(mm, every_n_bytes=64)
    n_in = mm.count()
    assert frames.count() >= n_in  # at least one frame per doc
    assert "frame_payload" in frames.columns


def test_real_codecs_roundtrip_and_resize():
    import numpy as np
    import pytest

    from futures_eos_cdc_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        resize_ppm,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)  # lossless

    # nearest-neighbor resize: exact pixel correspondence, not interpolation
    small = decode_ppm(resize_ppm(encode_ppm(img), 8, 6))
    assert small.shape == (6, 8, 3)
    assert np.array_equal(small[0, 0], img[0, 0])
    assert np.array_equal(small[5, 7], img[(5 * 12) // 6, (7 * 16) // 8])

    samples = rng.integers(-32768, 32768, size=300).astype("<i2")
    out, rate = decode_wav(encode_wav(samples))
    assert rate == 16000 and np.array_equal(out, samples)

    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"JFIF....")
    # truncated headers/planes must RAISE, not scan past the end (an
    # unbounded scan would hang the executor task instead of failing it)
    for bad in (b"P6", b"P6\n16 12\n255", b"P6\n16 12\n255\n\x00\x01"):
        with pytest.raises(ValueError):
            decode_ppm(bad)


def test_media_decode_rejects_compressed_formats(spark):
    import pytest

    from futures_eos_cdc_spark.operators.multimodal import decode_media_features

    df = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(b"\xff\xd8\xff"))],
        "doc_id long, format string, payload binary",
    )
    with pytest.raises(Exception, match="PIL"):
        decode_media_features(df).collect()


def test_embedding_near_dup_recall_and_precision(spark, sf_dir):
    # The Arrow-kernel LSH path: every emitted pair must truly clear the
    # threshold (zero false positives — pairs are verified with exact cosine
    # inside the bucket kernel), and recall vs brute force stays useful even
    # in the fixture's hardest regime (no planted dups, threshold 0.3).
    from futures_eos_cdc_spark.operators.similarity import (
        cosine_expr,
        embedding_near_dup,
    )

    e = _emb(spark, sf_dir)
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup(
            e, threshold=0.3, n_tables=12, bits_per_table=4
        ).collect()
    }
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    truth = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("c", cosine_expr(F.col("va"), F.col("vb")))
        .filter(F.col("c") >= 0.3)
        .collect()
    }
    assert not (got - truth), "false positives emitted"
    assert len(got & truth) / len(truth) >= 0.6, "recall too low"
    assert all(x < y for x, y in got)


def test_embedding_near_dup_skipped_bucket_accumulator(spark, sf_dir):
    # A max_bucket cap small enough that every populated bucket exceeds it
    # must (a) drop the capped buckets' pairs and (b) report the skips via
    # the skipped_buckets accumulator attached to the returned DataFrame —
    # the cap is a recall-loss alarm, never a silent truncation.
    from futures_eos_cdc_spark.operators.similarity import embedding_near_dup

    from futures_eos_cdc_spark.streaming.monitor import (
        ProgressRecorder,
        operator_counters,
    )

    e = _emb(spark, sf_dir).limit(50)
    capped = embedding_near_dup(
        e, threshold=0.3, n_tables=2, bits_per_table=1, max_bucket=3
    )
    n_pairs = capped.count()  # action: accumulator updates flow back
    assert capped.skipped_buckets.value > 0, "cap hit but no skip recorded"
    # ...and the count is observable through the monitoring surface (the
    # DataFrame attribute is lost by any .filter(); the registry is not)
    skips = operator_counters()["embedding_near_dup.skipped_buckets"]
    assert skips == capped.skipped_buckets.value
    totals = ProgressRecorder().totals()
    assert (
        totals["operator_counters"]["embedding_near_dup.skipped_buckets"]
        == skips
    )

    uncapped = embedding_near_dup(
        e, threshold=0.3, n_tables=2, bits_per_table=1, max_bucket=None
    )
    assert uncapped.count() > n_pairs
    uncapped.count()
    assert uncapped.skipped_buckets.value == 0


def test_ivf_training_deterministic_under_repartitioning(spark, sf_dir):
    """Centroid training must be partitioning-proof: decimal partial sums
    make the Lloyd steps exact, so retraining on a differently-partitioned
    (or retried) input yields bit-identical centroids — reproducible ANN."""
    from futures_eos_cdc_spark.operators.similarity import ivf_train
    from futures_eos_cdc_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    c1 = ivf_train(e.repartition(1), n_cells=8, iters=2)
    c2 = ivf_train(e.repartition(13), n_cells=8, iters=2)
    assert c1 == c2  # bit-identical, not approximately equal


def test_auto_n_cells_derivation(sf_dir):
    """SemDeDup auto-sizing (r6 VERDICT item 5): cells scale linearly with
    the corpus at constant per-cell membership, clamped at both ends; the
    500-vector driver fixture derives exactly the historical 16 so the
    module-level oracle strings stay valid there, and larger corpora get
    regenerated oracles via oracle_overrides_for_sf."""
    from futures_eos_cdc_spark.operators.similarity import auto_n_cells
    from futures_eos_cdc_spark.plans.dataprep import (
        embeddings_auto_n_cells,
        oracle_overrides_for_sf,
    )

    assert auto_n_cells(500) == 16
    assert auto_n_cells(0) == auto_n_cells(1) == 4  # floor clamp
    assert auto_n_cells(32 * 10_000) == 10_000  # linear at constant target
    assert auto_n_cells(10**12) == 1 << 20  # ceiling clamp
    # monotone non-decreasing over a sweep
    vals = [auto_n_cells(n) for n in range(0, 5000, 37)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))

    assert embeddings_auto_n_cells(sf_dir) == 16
    assert oracle_overrides_for_sf(sf_dir) == {}
    ov = oracle_overrides_for_sf("/root/testdata/sf0.1")  # 2000 vectors → 63
    from futures_eos_cdc_spark.plans.dataprep import IVF_FAMILY_ORACLE_BUILDERS

    assert set(ov) == set(IVF_FAMILY_ORACLE_BUILDERS)
    assert "d4_selection" in ov and "prototype_pruning" in ov
    # the regenerated SQL really carries the larger model (the data-sampled
    # init CTE takes the 63 smallest-hash vectors for this corpus)
    assert ov["semantic_dedup_embeddings"].count("named_struct") == 0  # sanity: SQL, not Spark expr
    assert "LIMIT 63" in ov["ann_cosine_ivf"]


def test_weighted_group_sample_append_safe_and_partitioning_proof(spark, sf_dir):
    """Mixture resampling must commute with ingestion: sampling the union
    of two corpus slices equals the union of sampling each slice (so daily
    appends never change earlier keep decisions), and repartitioning the
    input changes nothing."""
    from futures_eos_cdc_spark.operators.sampling import weighted_group_sample
    from futures_eos_cdc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    frac = {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.125}
    a = docs.filter("doc_id % 2 = 0")
    b = docs.filter("doc_id % 2 = 1")

    whole = {r.doc_id for r in weighted_group_sample(docs, "lang", frac, "doc_id").collect()}
    parts = {
        r.doc_id
        for df in (a, b)
        for r in weighted_group_sample(df, "lang", frac, "doc_id").collect()
    }
    assert whole == parts and len(whole) > 0

    repart = {
        r.doc_id
        for r in weighted_group_sample(
            docs.repartition(17), "lang", frac, "doc_id"
        ).collect()
    }
    assert repart == whole


def test_dedup_keep_rows_survivors_and_counts(spark):
    """Injected duplicates: the survivor is the lowest id per content, its
    n_copies counts the whole duplicate group, and every distinct content
    survives exactly once."""
    from futures_eos_cdc_spark.operators.dedup import dedup_keep_rows

    rows = [
        (10, "alpha"), (3, "alpha"), (7, "alpha"),
        (2, "beta"), (5, "beta"),
        (1, "gamma"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING").repartition(5)
    out = {
        r.text: (r.doc_id, r.n_copies)
        for r in dedup_keep_rows(df, ["text"], "doc_id").collect()
    }
    assert out == {"alpha": (3, 3), "beta": (2, 2), "gamma": (1, 1)}


def test_global_shuffle_shards_stable_and_contiguous(spark, sf_dir):
    """Shard assignment is content-stable (repartition/append invariant)
    and pos_in_shard is a contiguous 1..size ordering within each shard."""
    from futures_eos_cdc_spark.operators.sampling import global_shuffle_shards
    from futures_eos_cdc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = global_shuffle_shards(docs, "doc_id", 8).collect()
    b = global_shuffle_shards(docs.repartition(13), "doc_id", 8).collect()
    key = lambda rs: sorted((r.doc_id, r.shard_id, r.pos_in_shard) for r in rs)
    assert key(a) == key(b) and len(a) == docs.count()

    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))

    # append-safety: shard_id of a subset matches the full corpus run
    sub = global_shuffle_shards(docs.filter("doc_id % 2 = 0"), "doc_id", 8).collect()
    full_shard = {r.doc_id: r.shard_id for r in a}
    assert all(full_shard[r.doc_id] == r.shard_id for r in sub)


def test_write_training_shards_layout_and_order(spark, sf_dir, tmp_path):
    """Shard export: one shard_id=K directory per shard, rows stored in
    pos_in_shard order, and shard subsets read with partition pruning."""
    import os

    from futures_eos_cdc_spark.operators.sampling import (
        global_shuffle_shards,
        write_training_shards,
    )
    from futures_eos_cdc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(docs, "doc_id", 8, out)

    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    expect = {
        f"shard_id={r.shard_id}"
        for r in global_shuffle_shards(docs, "doc_id", 8)
        .select("shard_id").distinct().collect()
    }
    assert set(dirs) == expect

    one = spark.read.parquet(f"{out}/shard_id=3")
    positions = [r.pos_in_shard for r in one.collect()]
    assert positions == sorted(positions)  # on-disk order IS shard order

    pruned = spark.read.parquet(out).filter("shard_id = 3")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard_id" in plan


def test_dedup_against_corpus_injected_overlap(spark):
    """The fixture has no exact text collisions, so the incremental-dedup
    semantics are pinned here with injected overlap: batch rows already in
    the corpus are dropped, intra-batch duplicates keep the lowest id, and
    genuinely-new content survives."""
    from futures_eos_cdc_spark.operators.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(1, "old news"), (2, "stale story")], "doc_id INT, text STRING"
    )
    batch = spark.createDataFrame(
        [
            (10, "old news"),      # already in corpus → dropped
            (11, "fresh scoop"),   # new → kept
            (14, "fresh scoop"),   # intra-batch dup → dropped (11 wins)
            (12, "another take"),  # new → kept
        ],
        "doc_id INT, text STRING",
    ).repartition(3)
    out = dedup_against_corpus(batch, corpus, ["text"], "doc_id").collect()
    assert {(r.doc_id, r.text) for r in out} == {
        (11, "fresh scoop"), (12, "another take"),
    }


def test_simhash_hamming_pairs_match_all_pairs_brute_force(spark, sf_dir):
    """The probe join must find EXACTLY the pairs at Hamming ≤ 1 — verified
    against the quadratic reference over the fixture's signatures, with
    each pair emitted exactly once (the no-dedup-needed claim)."""
    from futures_eos_cdc_spark.operators.dedup import (
        simhash_hamming_pairs,
        with_simhash,
    )
    from futures_eos_cdc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = {
        r.doc_id: r.simhash16 for r in with_simhash(docs).collect()
    }
    ids = sorted(sigs)
    expect = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= 1
    }
    got = [(r.doc_a, r.doc_b, r.hamming) for r in simhash_hamming_pairs(docs).collect()]
    assert len(got) == len(set(got))  # exactly-once emission
    assert set(got) == expect


def test_simhash64_block_index_matches_brute_force(spark, sf_dir):
    """The Charikar 4-block candidate join must find EXACTLY the pairs at
    64-bit Hamming ≤ 3 — verified against the quadratic reference over the
    fixture's signatures, each pair emitted exactly once (the
    first-matching-block filter's no-dedup-needed claim)."""
    from futures_eos_cdc_spark.operators.dedup import (
        simhash64_hamming_pairs,
        with_simhash64,
    )
    from futures_eos_cdc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = {r.doc_id: r.sig for r in with_simhash64(docs).collect()}
    ids = sorted(sigs)
    mask = (1 << 64) - 1
    expect = {
        (a, b, bin((sigs[a] ^ sigs[b]) & mask).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((sigs[a] ^ sigs[b]) & mask).count("1") <= 3
    }
    got = [
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash64_hamming_pairs(docs).collect()
    ]
    assert len(got) == len(set(got))  # exactly-once emission
    assert set(got) == expect


def test_simhash64_rejects_hamming_beyond_block_guarantee(spark):
    from futures_eos_cdc_spark.operators.dedup import simhash64_hamming_pairs

    docs = spark.createDataFrame([(1, "a b c")], "doc_id INT, text STRING")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash64_hamming_pairs(docs, max_hamming=4)


def test_token_block_segments_tile_chunks_exactly(spark, sf_dir):
    """Every chunk's segments reconstruct it exactly: per-chunk segment
    tokens sum to n_tokens, no segment crosses a block edge, and segment 1
    (when present) starts at offset 0 of the NEXT block."""
    from futures_eos_cdc_spark.plans import QUERIES
    from futures_eos_cdc_spark.plans.dataprep import PACK_BUDGET

    tb = {
        (r.doc_id, r.chunk_idx): r
        for r in QUERIES["token_blocks"](spark, sf_dir).collect()
    }
    segs: dict[tuple, list] = {}
    for r in QUERIES["token_block_segments"](spark, sf_dir).collect():
        segs.setdefault((r.doc_id, r.chunk_idx), []).append(r)
    assert set(segs) == set(tb)
    for key, rows in segs.items():
        rows.sort(key=lambda r: r.seg_idx)
        assert sum(r.seg_tokens for r in rows) == tb[key].n_tokens
        for r in rows:
            assert r.start_in_block + r.seg_tokens <= PACK_BUDGET
            assert r.seg_tokens > 0
        if len(rows) == 2:
            assert rows[1].block_id == rows[0].block_id + 1
            assert rows[1].start_in_block == 0
            assert rows[0].start_in_block + rows[0].seg_tokens == PACK_BUDGET


def test_token_totals_closed_form_equals_fold():
    """The pure-integer closed form in q_token_blocks' totals pass must
    equal the literal per-chunk sum for every document length (the fold it
    replaced) — checked exhaustively across the lengths where every branch
    boundary lives (L < stride, L < size, exact multiples, off-by-ones)."""
    from futures_eos_cdc_spark.plans.dataprep import CHUNK_SIZE, CHUNK_STRIDE

    S, s = CHUNK_SIZE, CHUNK_STRIDE
    for L in range(1, 5000):
        m = (L - 1) // s
        fold = sum(min(S, L - s * i) for i in range(m + 1))
        c = min((L - S) // s + 1 if L >= S else 0, m + 1)
        closed = c * S + (m - c + 1) * L - s * (
            m * (m + 1) // 2 - (c - 1) * c // 2
        )
        assert closed == fold, L


def test_token_blocks_keeps_null_lang_docs(spark):
    """ADVICE regression: the (lang, shard) stitch join must be null-safe —
    NULL-lang documents pack like any other language group."""
    import futures_eos_cdc_spark.plans.dataprep as dp

    docs = spark.createDataFrame(
        [(1, None, "a b c d e f"), (2, "en", "g h i"), (40001, None, "x y z")],
        "doc_id long, lang string, text string",
    )
    out = dp.q_token_blocks(spark, "ignored", lambda *_: docs).collect()
    assert {r.doc_id for r in out} == {1, 2, 40001}
    by_doc = {r.doc_id: r for r in out}
    assert by_doc[1].lang is None  # sentinel never leaks into output
    # NULL-lang group is packed contiguously: doc 40001 (2nd null shard)
    # starts at doc 1's total token count
    assert by_doc[40001].stream_offset == 6


def test_line_dedup_keep_first_and_boilerplate_drop(spark):
    """CCNet-style line dedup: only the corpus-wide first occurrence of each
    line survives (order = doc_id, line_idx); with max_copies set, viral
    boilerplate lines are dropped entirely; reassembly md5 equals the
    locally-computed join of surviving lines."""
    import hashlib

    from futures_eos_cdc_spark.operators.dedup import (
        line_dedup_flags,
        reassemble_deduped_docs,
    )

    rows = [
        # doc 1: banner, unique, banner-again (intra-doc dup)
        (1, 0, "cookie banner"), (1, 1, "alpha beta"), (1, 2, "cookie banner"),
        # doc 2: banner (cross-doc dup), unique
        (2, 0, "cookie banner"), (2, 1, "gamma delta"),
        # doc 3: all lines seen elsewhere first
        (3, 0, "cookie banner"), (3, 1, "alpha beta"),
    ]
    lines = spark.createDataFrame(rows, "doc_id long, line_idx long, line string")

    flagged = line_dedup_flags(lines)
    kept = {(r.doc_id, r.line_idx) for r in flagged.collect() if r.keep}
    assert kept == {(1, 0), (1, 1), (2, 1)}  # first occurrences only

    # boilerplate rule: lines with > 2 copies vanish even at first occurrence
    noboiler = line_dedup_flags(lines, max_copies=2)
    kept2 = {(r.doc_id, r.line_idx) for r in noboiler.collect() if r.keep}
    assert kept2 == {(1, 1), (2, 1)}

    docs = {r.doc_id: r for r in reassemble_deduped_docs(flagged).collect()}
    # n_dup_lines counts lines whose content is duplicated ANYWHERE in the
    # corpus: banner x2 plus "alpha beta" (doc 3 holds a copy) = 3
    assert (docs[1].n_lines, docs[1].n_kept, docs[1].n_dup_lines) == (3, 2, 3)
    assert (docs[3].n_lines, docs[3].n_kept, docs[3].n_dup_lines) == (2, 0, 2)
    assert docs[1].kept_text_md5 == hashlib.md5(b"cookie banner alpha beta").hexdigest()
    assert docs[3].kept_text_md5 == hashlib.md5(b"").hexdigest()


def test_duplicate_spans_maximal_runs_and_caps(spark):
    """Gram-diagonal exact-substring spans: a shared passage is reported
    once, maximal, with correct 1-based starts; spans not extending beyond
    one gram are suppressed by min_len; viral grams beyond max_gram_occ
    drop out of candidates entirely."""
    from futures_eos_cdc_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e x y z"),
            (2, "q a b c d e r s"),
            (3, "x y z a b c w v"),   # shares "a b c" (len 3 < min_len) with 1,2
            (4, "m n o p q r s t"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_a, r.doc_b): (r.start_a, r.start_b, r.len_tokens)
        for r in duplicate_spans(docs, k=3, min_len=4).collect()
    }
    # docs 1-2 share "a b c d e": maximal, once, 1-based positions
    assert spans[(1, 2)] == (1, 2, 5)
    # doc 3's "x y z" with doc 1 and "a b c" with 1,2 are single grams -> dropped
    assert (1, 3) not in spans and (2, 3) not in spans
    assert len(spans) == 1

    # frequency cap: the shared 5-token run contains 3 grams, each occurring
    # twice; max_gram_occ=1 excludes them all -> no spans anywhere
    assert duplicate_spans(docs, k=3, min_len=4, max_gram_occ=1).count() == 0


def test_duplicate_spans_cap_boundary(spark):
    """r14 rn-cap guard (VERDICT r13): the pre-collect row_number cap must
    reproduce the exact count semantics at the boundary — a gram occurring
    EXACTLY max_gram_occ times corpus-wide stays in, one more occurrence
    anywhere drops it, and the retained gram's pair set is complete (every
    cross-doc pair, not just the first few)."""
    from futures_eos_cdc_spark.operators.dedup import duplicate_spans

    # "p q r s t u" appears in docs 1..4 -> each of its 4 grams occurs
    # exactly 4 times
    base = spark.createDataFrame(
        [
            (1, "p q r s t u a a a"),
            (2, "b b b p q r s t u"),
            (3, "c c p q r s t u c"),
            (4, "d p q r s t u d d"),
        ],
        "doc_id long, text string",
    )
    # cap = 4: every gram of the shared run is at the boundary -> ALL
    # C(4,2)=6 doc pairs must report the full 6-token span
    at_cap = {
        (r.doc_a, r.doc_b): r.len_tokens
        for r in duplicate_spans(base, k=3, min_len=4, max_gram_occ=4).collect()
    }
    assert at_cap == {
        (a, b): 6 for a in (1, 2, 3, 4) for b in range(a + 1, 5)
    }
    # cap = 3: the same grams (occ 4) are one over -> nothing survives
    assert duplicate_spans(base, k=3, min_len=4, max_gram_occ=3).count() == 0
    # doc 5 repeats gram "p q r" once more (occ 5): excluded at cap 4,
    # but the run's remaining grams (occ 4) still stitch the TAIL of the
    # span between docs 1..4: q..u = 5 tokens
    docs5 = base.union(
        spark.createDataFrame(
            [(5, "z z z z p q r z z")], "doc_id long, text string"
        )
    )
    tail = {
        (r.doc_a, r.doc_b): r.len_tokens
        for r in duplicate_spans(docs5, k=3, min_len=4, max_gram_occ=4).collect()
    }
    assert tail == {
        (a, b): 5 for a in (1, 2, 3, 4) for b in range(a + 1, 5)
    }


def test_bm25_ranking_invariants(spark, sf_dir):
    """BM25 retrieval: ranks are dense 1..k per query, scores descend with
    the doc_id tiebreak, and every scored doc actually contains at least
    one query term."""
    from futures_eos_cdc_spark.plans.dataprep import BM25_QUERIES, q_bm25_topk
    from futures_eos_cdc_spark.plans.registry import _t

    res = q_bm25_topk(spark, sf_dir, _t).collect()
    assert len(res) > 0
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    terms = {qid: set(s.split()) for qid, s in BM25_QUERIES}
    docs = {
        r.doc_id: set(r.text.lower().split())
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)
            assert a.score > 0
        for r in rows:
            assert docs[r.doc_id] & terms[qid]

def test_perplexity_hand_computed_on_tiny_corpus(spark, sf_dir):
    """Pin the bigram-LM semantics by exact hand computation: add-k
    conditional counts, 6dp-rounded per-bigram log-probs, exact decimal
    sum, mean negated. (The fixture corpus is random token soup, so
    discrimination-style assertions are meaningless there — the oracle
    pins engine parity; this pins the math.)"""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from futures_eos_cdc_spark.plans.dataprep import PPLX_K, q_doc_perplexity

    texts = {1: "a b a c", 2: "a b b", 3: "c a b"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def _t_tiny(spark_, sf_dir_, name):
        assert name == "documents"
        return docs

    got = {r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
           for r in q_doc_perplexity(spark, sf_dir, _t_tiny).collect()}

    toks = {d: t.split() for d, t in texts.items()}
    bigrams = [(d, (w[i - 1], w[i])) for d, w in toks.items() for i in range(1, len(w))]
    c2, c1, vocab = {}, {}, set()
    for _, (x, y) in bigrams:
        c2[(x, y)] = c2.get((x, y), 0) + 1
        c1[x] = c1.get(x, 0) + 1
    for w in toks.values():
        vocab.update(w)
    v = len(vocab)
    want = {}
    for d, w in toks.items():
        lps = [round(math.log((c2[(w[i-1], w[i])] + PPLX_K) / (c1[w[i-1]] + PPLX_K * v)), 6)
               for i in range(1, len(w))]
        total = sum(Decimal(str(x)) for x in lps)
        # Spark round() is HALF_UP; Python round() is half-even — the mean
        # of exact 6dp decimals CAN land on a tie (doc 3 here), so quantize
        # explicitly. The division must be float (the engine divides
        # doubles); only the final rounding mode differs.
        mean = Decimal(str(-float(total) / len(lps)))
        want[d] = (
            len(lps),
            float(mean.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)),
        )
    assert got == want


def test_minhash_dedup_against_corpus_injected_neardup(spark, sf_dir):
    """A batch doc that is a light mutation of a corpus doc (high jaccard,
    NOT an exact hash match) must be rejected; a fresh unique doc must
    survive — the near-dup granularity exact-hash incremental dedup lacks."""
    from futures_eos_cdc_spark.operators.dedup import minhash_dedup_against_corpus

    corpus = _docs(spark, sf_dir).select("doc_id", "text").limit(100)
    base = corpus.collect()[0]
    mutated = base.text + " trailingtoken"  # near-dup, different md5
    batch = spark.createDataFrame(
        [(10_000_001, mutated), (10_000_002, "utterly unique gibberish nothing shared qq ww ee rr tt yy")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in minhash_dedup_against_corpus(batch, corpus).collect()}
    assert kept == {10_000_002}


def test_minhash_dedup_prebuilt_index_parity(spark, sf_dir, tmp_path):
    """The prebuilt bands+shingles index path must admit exactly the same
    batch docs as the inline corpus-recompute path (the production form:
    probe the maintained index table instead of re-hashing the corpus)."""
    from futures_eos_cdc_spark.operators.dedup import (
        build_neardup_index,
        load_neardup_index,
        minhash_dedup_against_corpus,
    )

    corpus = _docs(spark, sf_dir).select("doc_id", "text").limit(100)
    base = corpus.collect()[0]
    batch = spark.createDataFrame(
        [
            (10_000_001, base.text + " trailingtoken"),
            (10_000_002, "utterly unique gibberish nothing shared qq ww ee rr tt yy"),
        ],
        "doc_id long, text string",
    )
    # production maintenance shape: initial build + per-batch append
    from futures_eos_cdc_spark.operators.dedup import append_to_neardup_index

    half = corpus.limit(50)
    rest = corpus.subtract(half)
    build_neardup_index(half, str(tmp_path / "ndidx"))
    append_to_neardup_index(rest, str(tmp_path / "ndidx"))
    idx = load_neardup_index(spark, str(tmp_path / "ndidx"))
    kept_inline = {r.doc_id for r in minhash_dedup_against_corpus(batch, corpus).collect()}
    kept_index = {
        r.doc_id
        for r in minhash_dedup_against_corpus(batch, corpus_index=idx).collect()
    }
    assert kept_index == kept_inline == {10_000_002}
    # exactly-one-corpus-form contract
    import pytest as _pytest

    with _pytest.raises(ValueError):
        minhash_dedup_against_corpus(batch, corpus, corpus_index=idx)
    with _pytest.raises(ValueError):
        minhash_dedup_against_corpus(batch)


def test_token_budget_rates_cap_and_contract(spark):
    """Rates realize the target mixture: uncapped groups get
    weight*budget/available exactly; over-allocated groups cap at 1; and
    the one-budget-form contract raises on misuse."""
    import pytest as _pytest

    from futures_eos_cdc_spark.operators.sampling import token_budget_rates

    docs = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 50), ("b", 50), ("c", 800)],
        "source string, n_tokens long",
    )
    # budget 400: a gets .5*400/200 = 1.0 (exact), b 0.25*400/100 = 1.0,
    # c 0.25*400/800 = 0.125
    rates = {
        r.source: (r.rate, r.available_tokens)
        for r in token_budget_rates(
            docs, {"a": 0.5, "b": 0.25, "c": 0.25}, budget_tokens=400
        ).collect()
    }
    assert rates == {"a": (1.0, 200), "b": (1.0, 100), "c": (0.125, 800)}
    # fraction mode: budget = 0.5 * 1100 total tokens -> c = .25*.5*1100/800
    frac = {
        r.source: r.rate
        for r in token_budget_rates(
            docs, {"a": 0.5, "b": 0.25, "c": 0.25}, budget_fraction=0.5
        ).collect()
    }
    assert frac["c"] == 0.25 * 0.5 * 1100 / 800
    with _pytest.raises(ValueError):
        token_budget_rates(docs, {"a": 1.0})
    with _pytest.raises(ValueError):
        token_budget_rates(docs, {"a": 1.0}, budget_tokens=10, budget_fraction=0.5)
    # groups without a weight are EXCLUDED, never implicitly rate-1
    # (Spark's least() skips NULLs — the trap this pins down)
    only_a = token_budget_rates(docs, {"a": 1.0}, budget_tokens=100).collect()
    assert {r.source for r in only_a} == {"a"}


def test_simhash64_dedup_prebuilt_index_parity(spark, sf_dir, tmp_path):
    """r6 VERDICT item 8: the persisted simhash64 block index (build +
    append + load) must gate a batch exactly as the inline corpus
    recompute does, and both must match the brute-force Hamming verdict
    over the raw signatures."""
    from futures_eos_cdc_spark.operators.dedup import (
        append_to_simhash64_index,
        build_simhash64_index,
        load_simhash64_index,
        simhash64_dedup_against_corpus,
        with_simhash64,
    )

    corpus = _docs(spark, sf_dir).select("doc_id", "text").limit(100)
    base = corpus.collect()[0]
    batch = spark.createDataFrame(
        [
            (10_000_001, base.text),  # Hamming 0 twin of a corpus doc
            (10_000_002, "utterly unique gibberish nothing shared qq ww ee rr tt yy"),
        ],
        "doc_id long, text string",
    )
    # brute-force expectation from the raw signatures
    cor_sigs = [r.sig for r in with_simhash64(corpus).collect()]
    mask = (1 << 64) - 1
    want = {
        r.doc_id
        for r in with_simhash64(batch).collect()
        if min(bin((r.sig ^ c) & mask).count("1") for c in cor_sigs) > 3
    }
    assert want == {10_000_002}

    half = corpus.limit(50)
    build_simhash64_index(half, str(tmp_path / "shidx"))
    append_to_simhash64_index(corpus.subtract(half), str(tmp_path / "shidx"))
    idx = load_simhash64_index(spark, str(tmp_path / "shidx"))
    assert idx.count() == 100 * 4  # 4 block rows per corpus doc

    kept_inline = {
        r.doc_id for r in simhash64_dedup_against_corpus(batch, corpus).collect()
    }
    kept_index = {
        r.doc_id
        for r in simhash64_dedup_against_corpus(batch, corpus_index=idx).collect()
    }
    assert kept_index == kept_inline == want

    import pytest as _pytest

    with _pytest.raises(ValueError):
        simhash64_dedup_against_corpus(batch, corpus, corpus_index=idx)
    with _pytest.raises(ValueError):
        simhash64_dedup_against_corpus(batch)
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash64_dedup_against_corpus(batch, corpus, max_hamming=4)


def test_ivf_assign_kernel_bit_identical_to_expression(spark, sf_dir):
    """The Arrow assignment kernel (the auto-sized-cells scale path) must
    reproduce the literal-expression fold EXACTLY — argmin cell ids equal
    on every vector, including band ties (epsilon re-score)."""
    from futures_eos_cdc_spark.operators import similarity as S

    e = _emb(spark, sf_dir)
    cents = S._hyperplanes(64, 157, 7)  # >4096 terms: the kernel regime
    expr = sorted(
        tuple(r)
        for r in e.select(
            "vec_id",
            S._cell_ranking_expr("embedding", cents).getItem(0).alias("cell"),
        ).collect()
    )
    kern = sorted(
        tuple(r)
        for r in S._assign_cells_kernel(e, cents, "vec_id", "embedding").collect()
    )
    assert expr == kern
    # and the router picks the kernel in this regime (no giant expression)
    routed = S.ivf_assign(e, cents)
    assert "MapInPandas" in routed._jdf.queryExecution().toString()


def test_assign_kernel_closure_pickles_self_contained():
    """The mapInPandas assign closure must serialize BY VALUE: executor
    Python workers share the driver's cwd but NOT its sys.path, so a
    by-reference pickle (qualified module name) dies with
    ModuleNotFoundError the first time a large-cell query runs from
    outside the repo — exactly how the grading driver runs."""
    import pickle
    import subprocess
    import sys
    import tempfile

    import cloudpickle
    import numpy as np

    from futures_eos_cdc_spark.operators.similarity import _make_assign_fn

    fn = _make_assign_fn(np.eye(4, dtype=np.float64), "vec_id", "embedding")
    blob = cloudpickle.dumps(fn)
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(blob)
        f.flush()
        # worker twin: fresh interpreter, cwd=/ and NO repo on sys.path
        code = (
            "import pickle, pandas as pd, numpy as np;"
            f"fn = pickle.load(open({f.name!r}, 'rb'));"
            "pdf = pd.DataFrame({'vec_id': [1, 2],"
            " 'embedding': [np.array([1.0,0,0,0]), np.array([0,0,0,1.0])]});"
            "out = list(fn(iter([pdf])))[0];"
            "assert list(out['cell']) == [0, 3], out"
        )
        subprocess.run(
            [sys.executable, "-c", code], cwd="/", check=True, timeout=120
        )


def test_ann_ivf_kernel_path_matches_expression_path(spark, sf_dir):
    """Past _ASSIGN_EXPR_MAX_TERMS, ann_topk_ivf routes corpus assignment
    AND query probe ranking through the Arrow kernels; the result set must
    equal the literal-expression plan bit-for-bit (same candidate cells in
    the same probe order -> same top-k)."""
    from futures_eos_cdc_spark.operators import similarity as S

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    cents = S._hyperplanes(64, 157, 11)  # 157*64 terms: kernel regime
    kern = sorted(
        tuple(r)
        for r in S.ann_topk_ivf(e, q, k=3, nprobe=4, centroids=cents).collect()
    )
    expr = sorted(
        tuple(r)
        for r in S.ann_topk_ivf(
            e, q, k=3, nprobe=4, centroids=cents, _force_expr=True
        ).collect()
    )
    assert kern == expr
    assert kern  # non-vacuous


def test_hybrid_rrf_equals_fusion_of_components(spark, sf_dir):
    """RRF semantics pinned against an independent reconstruction: run the
    two component retrievers, fuse their ranks in plain Python
    (Σ 1/(60+rank) over the lists a candidate appears in, ties on doc id),
    and require the operator's fused ranking to match exactly."""
    from futures_eos_cdc_spark.plans.dataprep import (
        HYBRID_DEPTH,
        HYBRID_TOPK,
        RRF_K,
        _bm25_scores,
        q_hybrid_rrf,
    )
    from futures_eos_cdc_spark.plans.registry import _t
    from futures_eos_cdc_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qt = (
        docs.filter(F.col("doc_id") < 5)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
        )
        .distinct()
    )
    lex_rows = _bm25_scores(docs, qt).filter(
        F.col("doc_id") != F.col("query_id")
    ).collect()
    lex_ranks: dict[tuple[int, int], int] = {}
    by_q: dict[int, list] = {}
    for r in lex_rows:
        by_q.setdefault(r.query_id, []).append((-r.score, r.doc_id))
    for q, rows in by_q.items():
        for i, (_, d) in enumerate(sorted(rows)[:HYBRID_DEPTH], 1):
            lex_ranks[(q, d)] = i
    sem_ranks = {
        (r.q_id, r.c_id): r.rank
        for r in brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=HYBRID_DEPTH).collect()
    }
    cands: dict[int, set] = {}
    for q, d in list(lex_ranks) + list(sem_ranks):
        cands.setdefault(q, set()).add(d)
    want = {}
    for q, ds in cands.items():
        scored = sorted(
            (
                -round(
                    (1.0 / (RRF_K + lex_ranks[(q, d)]) if (q, d) in lex_ranks else 0.0)
                    + (1.0 / (RRF_K + sem_ranks[(q, d)]) if (q, d) in sem_ranks else 0.0),
                    6,
                ),
                d,
            )
            for d in ds
        )
        for i, (neg, d) in enumerate(scored[:HYBRID_TOPK], 1):
            want[(q, d)] = (-neg, i)
    got = {
        (r.query_id, r.doc_id): (r.rrf_score, r.rank)
        for r in q_hybrid_rrf(spark, sf_dir, _t).collect()
    }
    assert got == want
    # both systems genuinely contribute: some fused rows are lexical-only
    # and some semantic-only
    assert any(k in lex_ranks and k not in sem_ranks for k in got)
    assert any(k in sem_ranks and k not in lex_ranks for k in got)


def test_q8_quantized_topk_recall_and_edges(spark, sf_dir):
    """SQ8 rung sanity: (a) the quantized score approximates true cosine
    (|Δ| small on the fixture), (b) quantized top-10 retains most of the
    exact top-10 (the re-rank band works), (c) zero vectors quantize to
    zeros instead of dividing by zero."""
    from futures_eos_cdc_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_q8,
        q8_quantize,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(e, qs, k=10)
    quant = brute_force_topk_q8(e, qs, k=10)
    ex, qt = {}, {}
    for r in exact.collect():
        ex.setdefault(r.q_id, set()).add(r.c_id)
    for r in quant.collect():
        qt.setdefault(r.q_id, set()).add(r.c_id)
    recall = sum(len(ex[q] & qt[q]) / len(ex[q]) for q in ex) / len(ex)
    assert recall >= 0.8, recall  # int8 keeps the neighborhood; re-rank fixes order

    # score error bound: compare q8_cosine to true cosine on the same pairs
    truth = {(r.q_id, r.c_id): r.cosine for r in brute_force_topk(e, qs, k=50).collect()}
    errs = [
        abs(r.q8_cosine - truth[(r.q_id, r.c_id)])
        for r in brute_force_topk_q8(e, qs, k=50).collect()
        if (r.q_id, r.c_id) in truth
    ]
    assert errs and max(errs) < 0.02, max(errs)

    z = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: list(r.q) for r in q8_quantize(z).collect()}
    assert rows[1] == [0] * 8
    assert rows[2] == [127] * 8


def test_ivf_recall_on_clustered_embeddings(spark):
    """r7 VERDICT #6: ANN earns its keep on CLUSTERED data — demonstrate
    recall ≥ 0.9 at nprobe ≪ n_cells when structure exists. 32 planted
    Gaussian clusters (well-separated directions, tight noise): a query's
    true top-k are its cluster-mates, IVF's trained cells align with the
    clusters, so probing 4/32 cells (12.5% of the corpus) recovers ≥90%
    of the exact top-k. The honest near-random counterpart stays in
    BENCH_NOTES (recall ≈ probed fraction there — ANN cannot beat
    structure that isn't in the data)."""
    import numpy as np

    from futures_eos_cdc_spark.operators.similarity import (
        ann_topk_ivf,
        brute_force_topk,
    )

    rng = np.random.default_rng(7)
    n_clusters, per, dim, k, nprobe = 32, 40, 16, 10, 4
    centers = rng.normal(0.0, 10.0, (n_clusters, dim))
    pts = (
        centers[:, None, :] + rng.normal(0.0, 0.5, (n_clusters, per, dim))
    ).reshape(-1, dim)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    queries = emb.filter(F.col("vec_id") % 128 == 0)  # one per ~3 clusters

    exact = brute_force_topk(emb, queries, k=k)
    approx = ann_topk_ivf(
        emb, queries, k=k, n_cells=n_clusters, nprobe=nprobe, dim=dim
    )
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r.q_id, set()).add(r.c_id)
    got: dict[int, set] = {}
    for r in approx.collect():
        got.setdefault(r.q_id, set()).add(r.c_id)
    recalls = [
        len(got.get(q, set()) & cs) / len(cs) for q, cs in truth.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert nprobe / n_clusters <= 0.15  # genuinely probing a small fraction
    assert mean_recall >= 0.9, (mean_recall, sorted(recalls)[:3])


def test_semantic_dedup_empty_corpus_degrades_gracefully(spark):
    """An empty daily batch/corpus must yield the empty roster, not a
    TypeError from first()[...] (removed-behavior regression guard for the
    round-7 data-sampled init)."""
    import pytest

    from futures_eos_cdc_spark.operators.similarity import ivf_train, semantic_dedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_dedup(empty)
    assert out.columns == ["vec_id", "cluster_id", "kept"]
    assert out.count() == 0
    with pytest.raises(ValueError, match="empty"):
        ivf_train(empty, n_cells=4)
    # the empty roster keeps the INPUT's id type (ADVICE r7: a hardcoded
    # `long` broke unions with prior string-id rosters)
    empty_str = spark.createDataFrame([], "vec_id string, embedding array<double>")
    assert dict(semantic_dedup(empty_str).dtypes)["vec_id"] == "string"


def test_pagerank_rejects_zero_checkpoint_every(spark):
    import pytest

    from futures_eos_cdc_spark.operators.clustering import pagerank

    edges = spark.createDataFrame([(1, 2)], ["doc_a", "doc_b"])
    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(edges, iters=1, checkpoint_every=0)


def test_ivf_kernel_preserves_id_type(spark):
    """Routing across the term budget must not change id behavior: string
    ids survive the Arrow kernel (the first kernel hardcoded `long`, which
    would throw or NULL them only past the threshold)."""
    import numpy as np

    from futures_eos_cdc_spark.operators import similarity as S

    rows = [(f"id{i}", [float(i % 7), 1.0, 0.0, 0.0]) for i in range(40)]
    e = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    cents = S._hyperplanes(4, 8, 3)
    kern = {
        (r.vec_id, r.cell)
        for r in S._assign_cells_kernel(e, cents, "vec_id", "embedding").collect()
    }
    expr = {
        (r.vec_id, r.cell)
        for r in e.select(
            "vec_id",
            S._cell_ranking_expr("embedding", cents).getItem(0).alias("cell"),
        ).collect()
    }
    assert kern == expr and len(kern) == 40


def test_q8_rerank_recall_and_full_band_exactness(spark, sf_dir):
    """The SQ8 ladder's re-rank rung (r8 VERDICT next #3): (a) recall@k
    of quantized-only vs re-ranked against the exact top-k — re-ranking
    a top-m band must never lose recall vs the quantized rung alone;
    (b) with the band as wide as the corpus the ladder IS the exact
    scan, bit for bit (rank ties included)."""
    from futures_eos_cdc_spark.operators.similarity import (
        brute_force_topk_q8,
        brute_force_topk_q8_rerank,
    )

    e = _emb(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    k, m = 3, 10
    exact = {(r.q_id, r.c_id) for r in brute_force_topk(e, q, k=k).collect()}
    q8only = {
        (r.q_id, r.c_id) for r in brute_force_topk_q8(e, q, k=k).collect()
    }
    rerank = {
        (r.q_id, r.c_id)
        for r in brute_force_topk_q8_rerank(e, q, k=k, m=m).collect()
    }
    r_q8 = len(exact & q8only) / len(exact)
    r_rr = len(exact & rerank) / len(exact)
    # measured on the fixtures (sf0.001 AND sf0.01): q8-only 1.000,
    # re-ranked 1.000 at m=10 — the synthetic neighbors are separated
    # far beyond int8 resolution, so the ladder's value here is the
    # bandwidth cut, not rescued recall; the full-band equality below is
    # the bit-exact pin. Numbers recorded in BENCH_NOTES.
    assert r_rr >= r_q8, f"re-rank lost recall: {r_rr:.2f} < {r_q8:.2f}"
    assert r_rr >= 0.8, f"re-rank recall too low: {r_rr:.2f}"

    n = e.count()
    full = sorted(
        tuple(r) for r in brute_force_topk_q8_rerank(e, q, k=k, m=n).collect()
    )
    want = sorted(tuple(r) for r in brute_force_topk(e, q, k=k).collect())
    assert full == want


def test_hybrid_rrf_ivf_semantic_side(spark, sf_dir):
    """The corpus-scale hybrid form (r8 VERDICT next #5): swapping the
    semantic side from the exact scan to IVF (nprobe=8/16) keeps the
    fused result close to the exact hybrid — the lexical half and the
    fusion are identical code, so degradation is bounded by the ANN
    rung's own recall (~0.83 at this probe fraction on this fixture,
    see test_ivf_recall_vs_brute_force)."""
    from futures_eos_cdc_spark.plans.dataprep import hybrid_rrf_frame

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    e = _emb(spark, sf_dir)
    exact = {
        (r.query_id, r.doc_id)
        for r in hybrid_rrf_frame(docs, e, semantic="exact").collect()
    }
    ivf = {
        (r.query_id, r.doc_id)
        for r in hybrid_rrf_frame(
            docs, e, semantic="ivf", n_cells=16, nprobe=8
        ).collect()
    }
    assert len(exact) > 0
    fused_recall = len(exact & ivf) / len(exact)
    assert fused_recall >= 0.8, f"fused recall too low: {fused_recall:.2f}"

    import pytest

    with pytest.raises(ValueError, match="expected 'exact' or 'ivf'"):
        hybrid_rrf_frame(docs, e, semantic="lsh")


def test_hybrid_rrf_ivf_matches_exact_on_clustered_embeddings(spark):
    """The companion to test_hybrid_rrf_ivf_semantic_side's fixture
    caveat (BENCH_SCALING round9_hybrid_ivf): when the embeddings DO
    cluster — the regime the IVF swap is for — the IVF-backed hybrid
    reproduces the exact hybrid almost verbatim at a production probe
    fraction (4/32 cells), because the trained cells capture the
    neighborhoods that brute force finds."""
    import random

    import numpy as np

    from futures_eos_cdc_spark.plans.dataprep import hybrid_rrf_frame

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 32, 40, 16
    centers = rng.normal(0.0, 10.0, (n_clusters, dim))
    pts = (
        centers[:, None, :] + rng.normal(0.0, 0.5, (n_clusters, per, dim))
    ).reshape(-1, dim)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(len(pts))],
        "vec_id long, embedding array<double>",
    )
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    pyrng = random.Random(11)
    docs = spark.createDataFrame(
        [
            (i, " ".join(pyrng.choice(words) for _ in range(12)))
            for i in range(len(pts))
        ],
        "doc_id long, text string",
    )
    exact = {
        (r.query_id, r.doc_id)
        for r in hybrid_rrf_frame(docs, emb, semantic="exact").collect()
    }
    ivf = {
        (r.query_id, r.doc_id)
        for r in hybrid_rrf_frame(
            docs, emb, semantic="ivf", n_cells=n_clusters, nprobe=4, dim=dim
        ).collect()
    }
    assert len(exact) > 0
    fused_recall = len(exact & ivf) / len(exact)
    assert fused_recall >= 0.9, f"clustered fused recall: {fused_recall:.2f}"


def test_temperature_mixture_rates_invariants(spark, sf_dir):
    """The alpha-sampling rule's pinned behavior: tau=1 reproduces the
    natural distribution (uniform rate = budget_fraction), tau=0
    flattens shares to equal, tau=0.5 sits between — upsampling tail
    languages relative to dominant ones — and realized token mass stays
    within the budget's ballpark on the fixture."""
    from pyspark.sql import functions as F

    from futures_eos_cdc_spark.operators.sampling import (
        temperature_mixture_rates,
        token_budget_sample,
    )
    from futures_eos_cdc_spark.operators.text import token_count_expr

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "lang",
            token_count_expr(F.col("text")).cast("long").alias("n_tokens"),
        )
    )
    B = 0.6
    r1 = {r["lang"]: r for r in temperature_mixture_rates(
        docs, temperature=1.0, budget_fraction=B).collect()}
    # tau=1: share == natural share -> rate == B for every group
    for lang, row in r1.items():
        assert abs(row["rate"] - B) < 1e-12, (lang, row["rate"])

    r0 = {r["lang"]: r for r in temperature_mixture_rates(
        docs, temperature=0.0, budget_fraction=B).collect()}
    shares0 = {row["share"] for row in r0.values()}
    assert len(shares0) == 1  # tau=0: equal shares for all groups

    rh = {r["lang"]: r for r in temperature_mixture_rates(
        docs, temperature=0.5, budget_fraction=B).collect()}
    big = max(rh.values(), key=lambda r: r["available_tokens"])
    small = min(rh.values(), key=lambda r: r["available_tokens"])
    # tau=0.5 upsamples the tail: smaller availability -> higher rate
    assert small["rate"] > big["rate"]
    # weights are the engine-exact floor(sqrt(n))
    import math

    for row in rh.values():
        assert row["weight"] == math.isqrt(row["available_tokens"])

    # applying the rates keeps roughly budget_fraction of the tokens
    kept = (
        token_budget_sample(docs, temperature_mixture_rates(
            docs, temperature=0.5, budget_fraction=B),
            group_col="lang", salt="tmix|")
        .agg(
            F.sum(F.when(F.col("kept"), F.col("n_tokens"))).alias("k"),
            F.sum("n_tokens").alias("t"),
        )
        .collect()[0]
    )
    assert 0.4 < kept["k"] / kept["t"] < 0.8  # hash-sample noise band


def test_temperature_mixture_excludes_unweighted_groups(spark):
    """Code-review r10: a group whose token column is all-NULL (or whose
    sum is non-positive, e.g. legacy size(NULL) = -1 leaking upstream)
    has no defined weight — it must be EXCLUDED from the rates table,
    not silently admitted whole via least(1.0, NULL)."""
    from futures_eos_cdc_spark.operators.sampling import temperature_mixture_rates

    docs = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 300), (3, "xx", None), (4, "yy", -5)],
        "doc_id long, lang string, n_tokens long",
    )
    rates = {r["lang"]: r for r in temperature_mixture_rates(docs).collect()}
    assert set(rates) == {"en"}  # xx (NULL sum) and yy (negative) excluded
    assert 0 < rates["en"]["rate"] <= 1.0

    # ADVICE r10: the invalid groups must not pollute _z/_total either —
    # every valid group's share/rate must be IDENTICAL to a run where the
    # invalid groups never existed (before the fix, yy's negative sum
    # entered _total and skewed en's rate).
    clean = spark.createDataFrame(
        [(1, "en", 100), (2, "en", 300)], "doc_id long, lang string, n_tokens long"
    )
    clean_rates = {r["lang"]: r for r in temperature_mixture_rates(clean).collect()}
    assert rates["en"]["share"] == clean_rates["en"]["share"]
    assert rates["en"]["rate"] == clean_rates["en"]["rate"]


def test_ivf_assign_with_dist_kernel_matches_expression(spark, sf_dir):
    """ivf_assign_with_dist's two shapes (literal array_min expression vs
    the Arrow kernel with the per-dim fold distance) must agree on cell
    AND on the distance DOUBLE bit-for-bit — the prototype-pruning rank
    depends on the raw (unrounded) distance ordering."""
    from futures_eos_cdc_spark.operators import similarity as S

    e = _emb(spark, sf_dir)
    cents = S._hyperplanes(64, 157, 7)  # >4096 terms: kernel regime
    kern = {
        r.vec_id: (r.cell, r.d)
        for r in S.ivf_assign_with_dist(e, cents).collect()
    }
    # force the expression path on the same centroids via the struct expr
    structs = ", ".join(
        f"named_struct('d', {S._dist2_sql('embedding', c)}, 'cell', {i})"
        for i, c in enumerate(cents)
    )
    import pyspark.sql.functions as _F

    best = _F.expr(f"array_min(array({structs}))")
    expr = {
        r.vec_id: (r.cell, r.d)
        for r in e.select(
            "vec_id",
            best.getField("cell").alias("cell"),
            best.getField("d").alias("d"),
        ).collect()
    }
    assert kern == expr  # exact double equality, not approx

    # small-model regime routes to the expression (no Python in the plan)
    small = S._hyperplanes(64, 8, 7)
    routed = S.ivf_assign_with_dist(e, small)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan


def test_prototype_pruning_semantics(spark, sf_dir):
    """The keep rule: hardest-first per cluster, exactly
    floor-at-the-rational-boundary 70% — every kept example's hard_rank
    is below every dropped one's within a cluster, and the kept count is
    the exact integer-rational cut."""
    from futures_eos_cdc_spark.plans.dataprep import q_prototype_pruning
    from futures_eos_cdc_spark.sources.tables import load_table

    rows = q_prototype_pruning(spark, sf_dir, load_table).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert len(rows) > 0
    for cid, members in by_cluster.items():
        size = members[0].cluster_size
        assert len(members) == size
        kept = [m for m in members if m.kept]
        # exact integer cut: max rank with rank*10 <= size*7
        assert len(kept) == (size * 7) // 10
        # kept are the hardest (largest proto_dist ranks first)
        max_kept = max(m.hard_rank for m in kept) if kept else 0
        min_dropped = min(
            (m.hard_rank for m in members if not m.kept), default=10**9
        )
        assert max_kept < min_dropped


def test_d4_composes_its_two_stages(spark, sf_dir):
    """D4 = SemDeDup then prototype-prune the survivors: the roster must
    contain exactly SemDeDup's kept set, and within each cluster the
    keep cut must be the integer-rational 70% of the SURVIVOR count (not
    the raw cluster size)."""
    import pyspark.sql.functions as _F

    from futures_eos_cdc_spark.plans.dataprep import (
        _SEMDEDUP_TAU,
        _trained_centroids,
        q_d4_selection,
    )
    from futures_eos_cdc_spark.operators.similarity import semantic_dedup
    from futures_eos_cdc_spark.sources.tables import load_table

    rows = q_d4_selection(spark, sf_dir, load_table).collect()
    e = load_table(spark, sf_dir, "embeddings")
    cents = _trained_centroids(spark, sf_dir, e)
    sem_kept = {
        r.vec_id
        for r in semantic_dedup(e, cents, threshold=_SEMDEDUP_TAU)
        .filter(_F.col("kept"))
        .collect()
    }
    assert {r.vec_id for r in rows} == sem_kept  # stage-1 output is the roster
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        surv = members[0].survivors
        assert len(members) == surv
        kept = [m for m in members if m.kept]
        assert len(kept) == (surv * 7) // 10
        max_kept = max((m.hard_rank for m in kept), default=0)
        min_drop = min((m.hard_rank for m in members if not m.kept), default=10**9)
        assert max_kept < min_drop


def test_moore_lewis_separates_domains(spark):
    """Moore-Lewis semantics the oracle can't state: documents written in
    the target slice's vocabulary score POSITIVE (target LM beats the
    general LM) and out-of-domain documents score NEGATIVE — including
    HELD-OUT docs whose bigrams the target LM never saw (the add-k
    left-join smoothing path)."""
    import pyspark.sql.functions as F

    from futures_eos_cdc_spark.plans.dataprep import (
        _bigrams_frame,
        _ml_lm_frame,
        _ML_TARGET_LANG,
    )

    tgt_words = "alpha beta gamma delta epsilon zeta"
    gen_words = "zork quux blarg wibble fnord grunt"
    rows = []
    for i in range(10):
        w = tgt_words.split()
        rows.append((i, "en", " ".join(w[i % 6:] + w[: i % 6])))
    for i in range(10, 30):
        w = gen_words.split()
        rows.append((i, "xx", " ".join(w[i % 6:] + w[: i % 6])))
    # held-out: target-style doc labelled OUT of the training slice, with
    # one bigram ('epsilon alpha' rotation) the target LM may not have seen
    rows.append((99, "xx", "alpha beta gamma delta epsilon zeta alpha"))
    rows.append((98, "xx", "zork quux blarg wibble fnord grunt zork"))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    toks, bg = _bigrams_frame(docs, keep_cols=("lang",))
    tgt = _ml_lm_frame(bg, toks, F.col("lang") == _ML_TARGET_LANG, "h_target")
    gen = _ml_lm_frame(bg, toks, F.lit(True), "h_general")
    out = {r.doc_id: r.s for r in gen.join(tgt, "doc_id").select(
        "doc_id", (F.col("h_general") - F.col("h_target")).alias("s")).collect()}
    assert all(out[i] > 0 for i in range(10)), "in-domain must score positive"
    assert all(out[i] < 0 for i in range(10, 30)), "out-of-domain negative"
    assert out[99] > 0, "held-out target-style doc must still score positive"
    assert out[98] < 0


# ---------------------------------------------------------------------------
# IVF-PQ (Jégou 2011) — semantics the SQL oracle can't state: recall
# behavior of the ADC band, exact degradation, kernel/expression parity.
# ---------------------------------------------------------------------------


def _pq_fixture_model(spark, sf_dir):
    from futures_eos_cdc_spark.operators import similarity as S

    e = _emb(spark, sf_dir)
    cents = S.ivf_train(e, 16, seed=42)
    cbs = S.pq_train(e, m=8, ksub=32, iters=2, seed=42)
    codes = S.pq_encode(e, cbs).localCheckpoint()
    return e, cents, cbs, codes


def test_ivf_pq_band_is_a_recall_dial(spark, sf_dir):
    """ADC scores rank PQ RECONSTRUCTIONS, so the exact-re-rank band is
    the recall/bandwidth dial: on the fixture's near-random embeddings
    (true top cosines ~0.3-0.48, tightly packed — the hardest regime for
    8x32 quantization) a k-sized band loses most of the probe-limited
    recall, while band=120 recovers the IVF probed-fraction ceiling
    (~0.83 at nprobe=8/16; measured 0.82). On a real near-dup corpus the
    distortion gap is far wider than the pack, so small bands suffice."""
    from futures_eos_cdc_spark.operators.similarity import (
        ann_topk_ivf_pq,
        brute_force_topk,
    )

    e, cents, cbs, codes = _pq_fixture_model(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 20)
    exact = {(r.q_id, r.c_id) for r in brute_force_topk(e, q, k=3).collect()}

    def recall(band):
        approx = {
            (r.q_id, r.c_id)
            for r in ann_topk_ivf_pq(
                e, q, k=3, nprobe=8, m=8, ksub=32, band=band,
                centroids=cents, codebooks=cbs, codes=codes,
            ).collect()
        }
        assert all(a != b for a, b in approx)
        return len(exact & approx) / len(exact)

    r10, r120 = recall(10), recall(120)
    assert r120 >= 0.75, f"IVF-PQ recall too low at band=120: {r120:.2f}"
    assert r120 >= r10, "widening the band must never lose recall"


def test_ivf_pq_degrades_to_brute_force(spark, sf_dir):
    """nprobe=n_cells + band >= corpus: every candidate survives the
    coarse probe AND the ADC band, so the exact re-rank IS brute force —
    the whole approximation must vanish bit-for-bit (same rounded scores,
    same tie-broken ranks)."""
    from futures_eos_cdc_spark.operators.similarity import (
        ann_topk_ivf_pq,
        brute_force_topk,
    )

    e, cents, cbs, codes = _pq_fixture_model(spark, sf_dir)
    q = e.filter(F.col("vec_id") < 10)
    full = sorted(
        tuple(r)
        for r in ann_topk_ivf_pq(
            e, q, k=3, nprobe=16, m=8, ksub=32, band=10**6,
            centroids=cents, codebooks=cbs, codes=codes,
        ).collect()
    )
    bf = sorted(tuple(r) for r in brute_force_topk(e, q, k=3).collect())
    assert full == bf and full


def test_pq_encode_kernel_matches_expression(spark, sf_dir):
    """The fixture codebook (8x32x8 = 2048 terms) is past
    _ASSIGN_EXPR_MAX_TERMS, so pq_encode routes through the Arrow kernel;
    the codes must equal the literal-expression plan bit-for-bit (same
    argmin, same tie-on-code) — the ann_topk_ivf parity discipline."""
    from futures_eos_cdc_spark.operators import similarity as S

    # vec_id filter, not limit(): two independent collect() jobs over an
    # unordered limit are not guaranteed the same 120 rows
    e = _emb(spark, sf_dir).filter(F.col("vec_id") < 120)
    cbs = S.pq_train(_emb(spark, sf_dir), m=8, ksub=32, iters=1, seed=42)
    kern = {r.vec_id: list(r.codes) for r in S.pq_encode(e, cbs).collect()}
    expr = {
        r.vec_id: list(r.codes)
        for r in S.pq_encode(e, cbs, _force_expr=True).collect()
    }
    assert kern == expr and kern


def test_pq_train_validates_inputs(spark, sf_dir):
    import pytest as _pt

    from futures_eos_cdc_spark.operators import similarity as S

    e = _emb(spark, sf_dir)
    with _pt.raises(ValueError, match="not divisible"):
        S.pq_train(e, m=7, ksub=8)
    with _pt.raises(ValueError, match="< ksub"):
        S.pq_train(e.limit(3), m=8, ksub=32)
    ragged = e.limit(8).withColumn(
        "embedding", F.slice("embedding", 1, 10)
    )
    with _pt.raises(ValueError, match="dim=64"):
        S.pq_train(ragged, m=8, ksub=4)
