"""Approximate record linkage: edit-distance string self-join.

The missing piece between exact dedup (operators/dedup.py: equality on a
digest) and the token-set similarity family (MinHash/Jaccard/SimHash):
matching VALUES that differ by a few character edits — misspelled entity
names, OCR noise, product-catalog variants. The classic pipeline need is
"join these two dirty name columns"; the naive plan is an O(n²) cross join
with ``levenshtein()`` in the filter, which no engine survives at corpus
scale.

Spark-first design — deletion-neighborhood blocking (FastSS; Bocek,
Hunt & Stiller, "Fast Similarity Search in Large Dictionaries", U. Zurich
TR 2007 — public):

1. collapse to DISTINCT strings first. Repeated values are the real-world
   quadratic killer (a million rows sharing one name would otherwise emit
   a million² candidates); after the collapse all candidate work is
   vocabulary-sized, and row-level linkage is a cheap equi-join back on
   the string.
2. every distinct string emits its ≤``max_dist``-deletion neighborhood
   (the string plus every variant obtainable by deleting up to k chars —
   |D≤k(s)| ≈ C(len, k) keys). Levenshtein(a, b) ≤ k implies the
   neighborhoods intersect (a substitution deletes the differing position
   on both sides; an insertion deletes the inserted char on one side), so
   an equi-join on the variant key yields a guaranteed candidate
   SUPERSET — no recall loss, unlike LSH banding.
3. exact ``levenshtein() <= max_dist`` verifies each candidate pair once
   (built-in JVM expression, no UDF).

Scale shape: one explode (factor C(len, k)) + one equi-join on variant
keys + per-pair verification. Variant keys of natural strings are
near-unique, so bucket occupancy — hence Σ C(occ, 2) candidate work — is
driven by genuinely-similar value groups, which is the answer's own size.
Keys shuffle as plain strings (bounded by the value length); ``max_dist``
beyond 2 grows the explode combinatorially and is rejected by default.

Reference parity: the reference engine has no fuzzy matching — this is
part of the beyond-reference training-data surface (catalog/entity
cleanup before training-set joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Explode factor is C(len, max_dist); beyond 2 the neighborhood of even a
# 20-char string is thousands of keys per row — almost never what a
# pipeline wants (use the token-set similarity family instead).
_MAX_SANE_DIST = 2


def _deletion_step(arr_expr: str) -> str:
    """SQL expr: all strings obtainable by deleting exactly ONE char from
    any string in the array ``arr_expr``, deduplicated. Guards the empty
    string: Spark's ``sequence(1, 0)`` counts DOWN ([1, 0]) instead of
    returning an empty sequence, so length-0 inputs must short-circuit."""
    one = (
        "transform(sequence(1, length(x)), i -> "
        "concat(substring(x, 1, i-1), substring(x, i+1, length(x))))"
    )
    return (
        f"array_distinct(flatten(transform({arr_expr}, x -> "
        f"case when length(x) = 0 then array() else {one} end)))"
    )


def deletion_neighborhood_expr(col: str, max_dist: int) -> str:
    """SQL expr for D≤k(``col``): the string plus every ≤``max_dist``-char
    deletion variant, deduplicated. Built by unrolling ``max_dist`` rounds
    of single-char deletion — k is a small literal, so the unrolled
    expression stays compact and fully JVM-side (codegen'd, no UDF)."""
    arr = f"array({col})"
    acc = arr
    for _ in range(max_dist):
        acc = f"array_union({acc}, {_deletion_step(acc)})"
    return acc


def fuzzy_string_self_join(
    strs: DataFrame,
    col: str = "s",
    max_dist: int = 1,
    min_dist: int = 1,
) -> DataFrame:
    """All pairs of distinct strings in ``strs[col]`` with
    ``min_dist <= levenshtein <= max_dist`` — (s_a, s_b, dist), s_a < s_b,
    each pair exactly once.

    Input should be the DISTINCT value table (the function re-distincts
    defensively — see module docstring step 1: value collapse is the scale
    invariant). ``min_dist=1`` excludes identical strings: equality is
    exact dedup's job, and including dist-0 would re-emit every value.
    """
    if not 0 <= max_dist <= _MAX_SANE_DIST:
        raise ValueError(
            f"max_dist={max_dist} outside [0, {_MAX_SANE_DIST}]: the "
            "deletion-neighborhood explode is C(len, k) per string — use "
            "the token-set similarity operators for looser matching"
        )
    s = strs.select(F.col(col).alias("s")).distinct()
    keyed = s.select(
        "s",
        F.explode(F.expr(deletion_neighborhood_expr("s", max_dist))).alias("k"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("s_a"), F.col("b.s").alias("s_b"))
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("s_a", "s_b").cast("int"))
        .filter((F.col("dist") >= min_dist) & (F.col("dist") <= max_dist))
        .select("s_a", "s_b", "dist")
    )


def fuzzy_link_values(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Two-table fuzzy equi-join on string columns: distinct value pairs
    (left_val, right_val, dist) with ``levenshtein <= max_dist``
    (INCLUDING exact matches — a linkage join wants those too). Row-level
    linkage is then two cheap equi-joins back on the value columns.

    Same FastSS blocking as :func:`fuzzy_string_self_join`, but keys join
    across the two (distinct-value) sides, and both orientations are kept
    because the pair is (left, right), not an unordered pair."""
    if not 0 <= max_dist <= _MAX_SANE_DIST:
        raise ValueError(f"max_dist={max_dist} outside [0, {_MAX_SANE_DIST}]")

    def _keyed(df: DataFrame, c: str, out: str) -> DataFrame:
        return (
            df.select(F.col(c).alias(out))
            .distinct()
            .select(
                out,
                F.explode(
                    F.expr(deletion_neighborhood_expr(out, max_dist))
                ).alias("k"),
            )
        )

    cand = (
        _keyed(left, left_col, "left_val")
        .join(_keyed(right, right_col, "right_val"), "k")
        .select("left_val", "right_val")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("left_val", "right_val").cast("int")
    ).filter(F.col("dist") <= max_dist)
