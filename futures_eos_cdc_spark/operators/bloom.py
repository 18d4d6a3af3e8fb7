"""Deterministic Bloom-filter membership gate for exact dedup at scale.

The Dolma/CCNet-style admission shape: a Bloom filter built over a
reference corpus's content digests answers "definitely new" vs "possibly
seen" with a CONSTANT-size structure, so the expensive exact-membership
join runs only over the filter's positives. No false negatives ever; the
false-positive rate is engineered by the bit-array size ``m`` and hash
count ``k`` (classic sizing ~10 bits/key for ~1% FP; this module exposes
both knobs).

Everything is md5-derived (bit position i of a digest = the low
``m_hex_chars`` hex chars of md5('{i}|' || digest)), so the filter is
content-stable and bit-reproducible in any engine with md5 — the DuckDB
oracle replays filter construction AND probing expression-for-expression.

Scale shape (100 TB): the set-bit table is AT MOST ``m`` rows (m is a
configuration constant, never data-sized) — broadcast forever; building
it is one digest-keyed distinct + a k-way explode collapsed by a distinct
over <= m values. Probing is a broadcast join + per-doc count — no
shuffle of the corpus. The exact-verify join (digest-keyed, the only
data-sized exchange) runs ONLY over bloom positives, which is the entire
point of the structure: at a 1% FP rate, 99% of genuinely-new documents
never enter the verify shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_HEX = 4  # bit positions = 16 bits -> m = 65536
BLOOM_K = 4  # hash functions


def bloom_positions_expr(
    digest: Column, k: int = BLOOM_K, m_hex_chars: int = BLOOM_M_HEX
) -> Column:
    """Array of the ``k`` bit positions a digest sets: position_i = first
    ``m_hex_chars`` hex chars of md5(i|digest) as an int (m = 16^chars)."""
    return F.array(
        *[
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}|"), digest)), 1, m_hex_chars),
                16,
                10,
            ).cast("int")
            for i in range(k)
        ]
    )


def bloom_gate(
    reference: DataFrame,
    candidates: DataFrame,
    *,
    k: int = BLOOM_K,
    m_hex_chars: int = BLOOM_M_HEX,
) -> DataFrame:
    """Probe ``candidates`` (doc_id, text) against a Bloom filter built
    from ``reference`` (text). Returns one row per candidate:
    (doc_id, bloom_positive, true_dup) — ``true_dup`` is the exact
    digest-membership verdict, computed ONLY for bloom positives (sound
    because a Bloom filter has no false negatives: a non-positive is
    definitely not a duplicate).

    Both inputs need a ``text`` column; ``candidates`` needs ``doc_id``.
    """
    ref_digests = reference.select(F.md5("text").alias("digest")).distinct()
    # The filter itself: distinct set-bit positions, <= m rows by
    # construction (m constant), hence unconditionally broadcastable.
    set_bits = (
        ref_digests.select(
            F.explode(bloom_positions_expr(F.col("digest"), k, m_hex_chars)).alias(
                "pos"
            )
        )
        .distinct()
        .withColumn("is_set", F.lit(1))
    )
    cand = candidates.select("doc_id", F.md5("text").alias("digest"))
    # Distinct (doc, pos): two of a doc's k hashes may collide on one
    # position; membership requires every DISTINCT position to be set.
    probes = cand.select(
        "doc_id",
        "digest",
        F.explode(bloom_positions_expr(F.col("digest"), k, m_hex_chars)).alias("pos"),
    ).distinct()
    verdict = (
        probes.join(F.broadcast(set_bits), "pos", "left")
        .groupBy("doc_id", "digest")
        .agg(
            (F.count(F.lit(1)) == F.sum(F.coalesce(F.col("is_set"), F.lit(0))))
            .alias("bloom_positive")
        )
    )
    positives = verdict.filter(F.col("bloom_positive"))
    exact = positives.join(
        ref_digests.withColumn("dup", F.lit(True)), "digest", "left"
    ).select("doc_id", F.coalesce(F.col("dup"), F.lit(False)).alias("true_dup"))
    return (
        verdict.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "bloom_positive",
            F.coalesce(F.col("true_dup"), F.lit(False)).alias("true_dup"),
        )
    )
