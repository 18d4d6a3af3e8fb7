"""Property-based tests (hypothesis) for the engine's pure expression logic:
the pieces where a boundary bug silently mis-buckets or mis-splits data at
100 TB. Driver-side properties are checked against pure-Python references;
one Spark round-trip per test keeps the suite fast."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from futures_eos_cdc_spark.operators.sampling import split_label_sql, split_thresholds
from futures_eos_cdc_spark.operators.signal_pipeline import WINDOW_SECONDS


# ---------------------------------------------------------------------------
# Window bucketing: epoch-aligned, integer div, never float
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.integers(min_value=0, max_value=4_102_444_800_000_000),  # µs to 2100
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=20, deadline=None)
def test_window_bucketing_matches_integer_reference(spark_prop, ts_list):
    w_us = WINDOW_SECONDS * 1_000_000
    df = spark_prop.createDataFrame([(t,) for t in ts_list], "ts_us long")
    got = [
        r.w
        for r in df.select(
            F.expr(f"(ts_us div {w_us}) * {WINDOW_SECONDS}").cast("long").alias("w")
        ).collect()
    ]
    want = [(t // w_us) * WINDOW_SECONDS for t in ts_list]
    assert got == want
    # every bucket start is epoch-aligned and <= its ts
    for t, w in zip(ts_list, got):
        assert w % WINDOW_SECONDS == 0 and w * 1_000_000 <= t


# ---------------------------------------------------------------------------
# Hash split: total cover, no overlap, threshold arithmetic
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=50, deadline=None)
def test_split_thresholds_are_monotone_and_cover(weights_list):
    weights = {f"s{i}": w for i, w in enumerate(weights_list)}
    bounds = split_thresholds(weights)
    assert len(bounds) == len(weights) - 1
    hexes = [int(ub, 16) for _, ub in bounds]
    assert hexes == sorted(hexes)  # monotone cumulative bounds
    assert all(0 <= h <= 255 for h in hexes)
    # SQL renders every label exactly once, last one as ELSE
    sql = split_label_sql("x", weights)
    for label in weights:
        assert f"'{label}'" in sql
    assert sql.strip().endswith(f"ELSE 's{len(weights_list)-1}' END")


def test_split_is_deterministic_and_partitioning_proof(spark_prop):
    # same ids, different partitioning → identical assignment
    from futures_eos_cdc_spark.operators.sampling import hash_split

    a = hash_split(spark_prop.range(0, 2000, 1, 1), "id")
    b = hash_split(spark_prop.range(0, 2000, 1, 13), "id")
    ma = {r.id: r.split for r in a.collect()}
    mb = {r.id: r.split for r in b.collect()}
    assert ma == mb
    frac = sum(1 for v in ma.values() if v == "train") / len(ma)
    assert 0.75 <= frac <= 0.85  # 80% ± hash noise


# ---------------------------------------------------------------------------
# Jaccard expression == Python set reference
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.sets(st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=8),
            st.sets(st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=8),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=15, deadline=None)
def test_jaccard_expr_matches_python_sets(spark_prop, pairs):
    from futures_eos_cdc_spark.operators.dedup import jaccard_expr

    df = spark_prop.createDataFrame(
        [(sorted(a), sorted(b)) for a, b in pairs],
        "a array<string>, b array<string>",
    )
    got = [r.j for r in df.select(jaccard_expr(F.col("a"), F.col("b")).alias("j")).collect()]
    want = [len(a & b) / len(a | b) for a, b in pairs]
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 intervals: per key, versions tile the timeline — ordered, non-
# overlapping, adjacent (each valid_to equals the next change's ts), exactly
# one open current version unless the key ends deleted
# ---------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # key
            st.sampled_from(["c", "u", "u", "d"]),   # op (update-heavy)
            st.integers(min_value=1, max_value=8),   # coarse ts (ties likely)
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_scd2_intervals_tile_the_timeline(spark_prop, changes):
    from futures_eos_cdc_spark.operators.order_pipeline import cdc_scd2_history

    rows = [
        (key, op, ts * 100, seq) for seq, (key, op, ts) in enumerate(changes)
    ]
    df = spark_prop.createDataFrame(rows, "id long, op string, ts_ms long, seq long")
    hist = cdc_scd2_history(
        df, ["id"], ts_col="ts_ms", tiebreak_cols=["seq"]
    ).collect()

    # pure-Python reference timeline per key over ALL changes (incl. deletes)
    by_key: dict[int, list] = {}
    for key, op, ts, seq in ((r[0], r[1], r[2], r[3]) for r in rows):
        by_key.setdefault(key, []).append((ts, seq, op))
    got_by_key: dict[int, list] = {}
    for r in sorted(hist, key=lambda r: (r.id, r.ts_ms, r.seq)):
        got_by_key.setdefault(r.id, []).append(r)

    for key, log in by_key.items():
        log.sort()
        versions = got_by_key.get(key, [])
        # emitted versions = the non-delete changes, in order
        assert [(v.ts_ms, v.seq) for v in versions] == [
            (ts, seq) for ts, seq, op in log if op != "d"
        ]
        # adjacency: valid_to of each emitted version == ts of the NEXT
        # change (any op) for that key; the last change's version is open
        for v in versions:
            later = [e for e in log if (e[0], e[1]) > (v.ts_ms, v.seq)]
            if later:
                assert v.valid_to == later[0][0], (key, v, later[0])
                assert v.is_current is False
            else:
                assert v.valid_to is None
                assert v.is_current is True
        # at most one current version; none if the key's last change is 'd'
        currents = [v for v in versions if v.is_current]
        last_op = log[-1][2]
        assert len(currents) == (0 if last_op == "d" else 1)


# ---------------------------------------------------------------------------
# Z-order interleave: bijective on the 2^bits x 2^bits grid, range-monotone
# ---------------------------------------------------------------------------
def _morton_ref(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=25, deadline=None)
def test_zorder_key_matches_bitwise_reference(spark_prop, pts):
    """The portable div/mod formula equals the literal bit interleave, and
    distinct (a, b) points get distinct keys (bijectivity is what makes a
    zkey sort a space-filling layout rather than a lossy hash)."""
    from futures_eos_cdc_spark.sources.bucketing import zorder_key_expr

    df = spark_prop.createDataFrame(pts, "a INT, b INT")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zorder_key_expr("a", "b", 8)).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton_ref(a, b, 8), (a, b)
    assert len(set(got.values())) == len(got)  # injective on the grid

    # the Column-accepting path (public functions surface) must agree with
    # the SQL-string path exactly
    got_col = {
        (r.a, r.b): r.z
        for r in df.withColumn(
            "z", zorder_key_expr(F.col("a"), F.col("b"), 8).cast("long")
        ).collect()
    }
    assert got_col == got


# ---------------------------------------------------------------------------
# Incremental dedup: Spark result == pure-Python reference on random corpora
# ---------------------------------------------------------------------------
@given(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12),  # corpus texts
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=12),  # batch texts
)
@settings(max_examples=15, deadline=None)
def test_dedup_against_corpus_matches_reference(spark_prop, corpus_texts, batch_texts):
    from futures_eos_cdc_spark.operators.dedup import dedup_against_corpus

    corpus = spark_prop.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)] or [(0, "zzz")],
        "doc_id INT, text STRING",
    )
    if not corpus_texts:
        corpus = corpus.filter("doc_id < 0")  # genuinely empty corpus
    batch = spark_prop.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)], "doc_id INT, text STRING"
    )
    got = {
        (r.doc_id, r.text)
        for r in dedup_against_corpus(batch, corpus, ["text"], "doc_id").collect()
    }
    seen, expect = set(corpus_texts), set()
    for i, t in enumerate(batch_texts):
        if t not in seen:
            expect.add((100 + i, t))
            seen.add(t)
    assert got == expect


@given(
    bounds=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-50, 150)),
            st.one_of(st.none(), st.integers(-50, 150)),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_manifest_pruning_never_skips_matching_files(bounds):
    """Data-skipping soundness: for ANY closed range, prune_files must admit
    every file whose rows intersect the range (false skips lose data;
    false admissions only cost I/O). Pure-python property over a synthetic
    manifest mirroring disjoint range-clustered files of 0..99."""
    from futures_eos_cdc_spark.sources.manifest import prune_files

    # ten files, file i holds values [10i, 10i+9]; one file with no stats
    manifest = [
        {"file": f"f{i}", "column": "v", "min": 10 * i, "max": 10 * i + 9,
         "rows": 10, "has_nulls": False}
        for i in range(10)
    ] + [{"file": "fx", "column": "v", "min": None, "max": None,
          "rows": 5, "has_nulls": True}]
    for lo, hi in bounds:
        keep = set(prune_files(manifest, {"v": (lo, hi)}))
        assert "fx" in keep  # stats-free file always admitted
        for i in range(10):
            fmin, fmax = 10 * i, 10 * i + 9
            file_matches = (lo is None or fmax >= lo) and (hi is None or fmin <= hi)
            if file_matches:
                assert f"f{i}" in keep, (lo, hi, i)
            else:
                assert f"f{i}" not in keep, (lo, hi, i)  # tight stats => exact skip


# ---------------------------------------------------------------------------
# Linear ExactSubstr cut: exact agreement with a pure-Python reference
# ---------------------------------------------------------------------------
def _gram_cut_reference(texts: list[str], k: int):
    """Pure-Python replay of cut_duplicated_grams' declared semantics:
    global (doc, pos) first occurrence per k-gram, coverage sweep, kept
    tokens rejoined with single spaces."""
    import hashlib

    toks = [t.split() for t in texts]
    first: dict[tuple, tuple] = {}
    for d, ts in enumerate(toks):
        for p in range(len(ts) - k + 1):
            g = tuple(ts[p:p + k])
            if g not in first:
                first[g] = (d, p)
    counts: dict[tuple, int] = {}
    for ts in toks:
        for p in range(len(ts) - k + 1):
            g = tuple(ts[p:p + k])
            counts[g] = counts.get(g, 0) + 1
    out = []
    for d, ts in enumerate(toks):
        cut = [False] * len(ts)
        for p in range(len(ts) - k + 1):
            g = tuple(ts[p:p + k])
            if counts[g] > 1 and first[g] != (d, p):
                for i in range(p, p + k):
                    cut[i] = True
        kept = [w for w, c in zip(ts, cut) if not c]
        cleaned = " ".join(kept)
        out.append(
            (len(ts), len(ts) - len(kept),
             hashlib.md5(cleaned.encode()).hexdigest())
        )
    return out


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_cut_duplicated_grams_matches_python_reference(spark_prop, texts):
    """Random tiny-vocab corpora (maximal gram collisions, overlapping
    runs, within-doc repeats, empty docs): the distributed sweep must
    agree with the sequential reference on every doc's
    (n_tokens, n_removed, cleaned_md5)."""
    from futures_eos_cdc_spark.operators.dedup import cut_duplicated_grams

    texts = [t if t else "solo" for t in texts]  # empty string -> 1 token
    docs = spark_prop.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.cleaned_md5)
        for r in cut_duplicated_grams(docs, k=3).collect()
    }
    want = _gram_cut_reference(texts, k=3)
    for d, exp in enumerate(want):
        assert got[d] == exp, (d, texts[d], got[d], exp)
