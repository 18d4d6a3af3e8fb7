"""The reference's core "query": signals → windowed aggregation → decisions.

Re-expresses, Spark-first, the whole signal-processor topology
(reference: apps/signal-processor/.../topology/SignalTopology.kt:27-84):

    3 Kafka sources → parse JSON (drop malformed) → merge → key by symbol
    → 5-minute tumbling window aggregate (SignalAggregator)
    → filter ≥2 distinct timeframes → DecisionMaker → decisions

Operator-by-operator mapping (SURVEY.md §2.3/§2.4):

- A1 windowed groupBy       → 5-min epoch-aligned bucket on event time ``ts``
- A2 per-timeframe last-10  → row_number() over (symbol, window, timeframe
                              ORDER BY ts DESC, signal_id DESC) <= 10
                              (arrival order re-specified to ts order —
                              deterministic; SURVEY.md §7.4.1)
- A3 avg price / timeframe  → avg over the rn<=10 subset (decimal-exact sum)
- A4 buy/sell balance       → sum(side=BUY ? +1 : -1) over ALL window rows
                              (untrimmed — SignalAggregator.kt:30-34 never
                              evicts; deliberately preserved, §7.4.6)
- A5 net balance            → sum of per-timeframe balances
- A6 trimmed signal count   → sum(min(count_tf, 10))
- A8 avg of per-tf avgs     → two-level mean (NOT the global mean price)
- A9 alignment score        → per-tf majority side (tie → lexicographic max,
                              §7.4.2); all agree → 1.0 else 0.5
- A10 price volatility      → population stddev of the rn<=10 prices,
                              0.0 when <2 prices (SignalAggregator.kt:64-76)
- D1-D5 decision exprs      → CASE/threshold expressions (DecisionMaker.kt)
- P5 HAVING                 → countDistinct(timeframe) >= 2
                              (SignalAggregator.kt:38 — ≥2 distinct
                              timeframes, not ≥2 signals)

Determinism for oracle checking: float summation order varies with
partitioning, so every sum over doubles is computed on ``decimal(38,10)``
casts (exact arithmetic — identical results on any engine), variance uses the
sum/sum-of-squares identity on those exact sums, and emitted timestamps are
epoch **seconds** (BIGINT), never raw timestamps (timezone-proof). The same
trick is mirrored in the DuckDB oracle SQL (queries/oracles.py).

Scale notes (100 TB): the plan is two hash-exchanges — one on
(symbol, window_start, timeframe) for the ranking + per-timeframe aggregates,
one on (symbol, window_start) for the final rollup. No collect, no Python
UDFs, all whole-stage-codegen expressions. Cardinality after the first
aggregate is bounded by |symbols| x |windows| x 3 — tiny relative to input —
so the final joins are AQE-broadcastable. Skewed symbols are handled by AQE
skew-join; the ranking window is bounded per group only by window span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..schemas import SIGNAL_WIRE_SCHEMA

DEC = "decimal(38,10)"

# D1 thresholds (DecisionMaker.kt:49-89)
STRONG_BUY_MIN = 5  # balance >  5 → STRONG_BUY
BUY_MIN = 2  # balance >  2 → BUY
SELL_MAX = -2  # balance < -2 → SELL
STRONG_SELL_MAX = -5  # balance < -5 → STRONG_SELL

# D2 price adjustment multipliers (DecisionMaker.kt:58,63,73,78,87)
PRICE_MULT = {
    "STRONG_BUY": 0.998,
    "BUY": 0.999,
    "HOLD": 1.0,
    "SELL": 1.001,
    "STRONG_SELL": 1.002,
}

BUFFER_KEEP = 10  # A2 last-10 (SignalAggregator.kt:19-21)
TOP_RECENT = 5  # D5 five most-recent (DecisionMaker.kt:119)
WINDOW_SECONDS = 300  # T1 5-minute tumbling, zero grace (SignalTopology.kt:52)


# ---------------------------------------------------------------------------
# P1/P2: lenient JSON parse + enrichment
# ---------------------------------------------------------------------------
def parse_signals(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse JSON signal lines, silently dropping malformed records.

    Mirrors flatMapValues{parse or []} (SignalTopology.kt:93-100) and the
    lenient Jackson config (JsonMapper.kt:17-22): ``from_json`` returns a
    null struct on corrupt input and ignores unknown JSON fields, so
    null-filtering reproduces drop-on-error exactly.
    """
    parsed = raw.withColumn("s", F.from_json(F.col(value_col), SIGNAL_WIRE_SCHEMA))
    return (
        parsed.filter(F.col("s").isNotNull() & F.col("s.symbol").isNotNull())
        .select("s.*")
        .withColumn("processed_at", F.current_timestamp())  # P2
    )


def with_strength(signals: DataFrame) -> DataFrame:
    """P10: timeframe → strength CASE (Signal.kt:23-29,36-41)."""
    tf = F.col("timeframe")
    return signals.withColumn(
        "strength",
        F.when(tf == "1m", "WEAK")
        .when(tf == "5m", "MEDIUM")
        .when(tf == "15m", "STRONG")
        .otherwise("UNKNOWN"),
    ).withColumn(
        "strength_weight",
        F.when(tf == "1m", 1).when(tf == "5m", 2).when(tf == "15m", 3).otherwise(0),
    )


# ---------------------------------------------------------------------------
# Signal derivation from the driver's `events` fixture (test adapter)
# ---------------------------------------------------------------------------
SYMBOLS = ("BTCUSDT", "ETHUSDT", "SOLUSDT", "XRPUSDT", "NAS100")
BUY_EVENT_TYPES = ("purchase", "signup", "click")


def signals_from_events(events: DataFrame) -> DataFrame:
    """Deterministically reinterpret the `events` fixture as a signal stream.

    Keeps ``event_id`` as ``signal_id`` — the unique total-order tie-breaker
    that makes "last N by ts" deterministic (SURVEY.md §7.4.1). The identical
    derivation exists as SQL in plans/flagship.py so the DuckDB oracle sees
    the same stream. ``ts`` arrives as epoch-nanos LongType (see
    sources.tables.load_table) and is truncated to epoch-micros ``ts_us`` —
    the finest precision DuckDB's parquet reader preserves.
    """
    sym = F.col("user_id") % 5
    return events.select(
        F.col("event_id").alias("signal_id"),
        F.when(sym == 0, SYMBOLS[0])
        .when(sym == 1, SYMBOLS[1])
        .when(sym == 2, SYMBOLS[2])
        .when(sym == 3, SYMBOLS[3])
        .otherwise(SYMBOLS[4])
        .alias("symbol"),
        F.when(F.col("event_type").isin(*BUY_EVENT_TYPES), "BUY")
        .otherwise("SELL")
        .alias("side"),
        (F.col("event_id") % 50 / 100.0 + 0.01).alias("qty"),
        F.col("value").alias("price"),
        F.when(F.col("event_id") % 3 == 0, "1m")
        .when(F.col("event_id") % 3 == 1, "5m")
        .otherwise("15m")
        .alias("timeframe"),
        F.expr("ts div 1000").alias("ts_us"),
    )


def with_ts_us(signals: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize a wire-format signal (epoch-millis ``ts``, Signal.kt:19) to
    the engine's canonical epoch-micros ``ts_us`` event time.

    Micros (not nanos): Spark timestamps are micros internally, and DuckDB's
    parquet reader truncates ns to µs — so µs is the finest precision every
    engine in the toolchain can agree on."""
    return signals.withColumn("ts_us", F.col(ts_col).cast("long") * 1_000)


# ---------------------------------------------------------------------------
# A1: epoch-aligned tumbling window bucket
# ---------------------------------------------------------------------------
def window_start_s_expr(window_seconds: int = WINDOW_SECONDS) -> Column:
    """Tumbling-window start (epoch seconds, BIGINT) from epoch-micros ts_us.

    Integer `div` — NEVER double division: epoch-micros (~1.7e15) sits at the
    edge of a double's 53-bit exact-integer range, so float math could
    mis-bucket. Epoch-aligned exactly like Kafka Streams' TimeWindows
    (SignalTopology.kt:52).
    """
    w_us = window_seconds * 1_000_000
    return F.expr(f"(ts_us div {w_us}) * {window_seconds}").cast("long")


def _dec_avg(sum_col: str, cnt_col: str) -> Column:
    return F.col(sum_col).cast("double") / F.col(cnt_col)


# ---------------------------------------------------------------------------
# The full decision pipeline (batch form, window-function based)
# ---------------------------------------------------------------------------
def decide(
    signals: DataFrame,
    window_seconds: int = WINDOW_SECONDS,
    round_dp: int = 6,
) -> DataFrame:
    """signals → one decision row per (symbol, window) with >=2 timeframes.

    Input columns: signal_id, symbol, side, qty, price, timeframe, ts_us
    (epoch micros, LongType). Output: symbol, window_start_s, n_timeframes,
    n_signals, balance, avg_price, alignment, avg_volatility, action,
    confidence, suggested_price, suggested_qty, reason.
    """
    b = signals.withColumn("window_start_s", window_start_s_expr(window_seconds))

    # A2: rank within (symbol, window, timeframe) by recency; rn<=10 is the buffer
    w_tf = Window.partitionBy("symbol", "window_start_s", "timeframe").orderBy(
        F.desc("ts_us"), F.desc("signal_id")
    )
    r = b.withColumn("rn", F.row_number().over(w_tf))

    in_buf = F.col("rn") <= BUFFER_KEEP
    price_dec = F.col("price").cast(DEC)
    # price*price is a double multiply (bit-identical on any engine), cast
    # AFTER the multiply so decimal precision never truncates differently.
    price2_dec = (F.col("price") * F.col("price")).cast(DEC)

    # Per-timeframe aggregates: A3 (avg over buffer), A4 (untrimmed balance),
    # A6 (capped count), A9 majority inputs, A10 (population stddev over
    # buffer), and the ≤5-element recency buffer feeding D5. Grouping keys are
    # a superset of the window-partition keys, so Catalyst reuses the exchange
    # — the whole per-timeframe stage costs ONE shuffle.
    is_buy = F.col("side") == "BUY"
    tf_agg = r.groupBy("symbol", "window_start_s", "timeframe").agg(
        F.sum(F.when(is_buy, 1).otherwise(-1)).alias("balance_tf"),
        F.count(F.lit(1)).alias("cnt_all"),
        F.count(F.when(in_buf, 1)).alias("cnt_buf"),
        F.sum(F.when(in_buf, price_dec)).alias("sum_p"),
        F.sum(F.when(in_buf, price2_dec)).alias("sum_p2"),
        # A9 majority side inputs: buffered BUY vs SELL counts
        F.count(F.when(in_buf & is_buy, 1)).alias("buf_buy"),
        F.count(F.when(in_buf & ~is_buy, 1)).alias("buf_sell"),
        # D5 feed: the 5 most-recent buffered (ts, id, qty) — bounded (≤10
        # collected, ≤5 kept), NOT an unbounded collect_list
        F.slice(
            F.reverse(
                F.array_sort(
                    F.collect_list(
                        F.when(in_buf, F.struct("ts_us", "signal_id", "qty"))
                    )
                )
            ),
            1,
            TOP_RECENT,
        ).alias("recent_tf"),
    )
    mean_p = _dec_avg("sum_p", "cnt_buf")
    mean_p2 = _dec_avg("sum_p2", "cnt_buf")
    tf_agg = tf_agg.withColumn("avg_price_tf", mean_p).withColumn(
        # A10: population stddev via the exact-sum identity; <2 prices → 0.0
        "vol_tf",
        F.when(F.col("cnt_buf") < 2, F.lit(0.0)).otherwise(
            F.sqrt(F.greatest(mean_p2 - mean_p * mean_p, F.lit(0.0)))
        ),
    ).withColumn(
        # A9: majority side over the buffer; tie → lexicographic max ("SELL")
        # per SURVEY.md §7.4.2 — a plain CASE, no extra aggregation needed
        "maj_side",
        F.when(F.col("buf_buy") > F.col("buf_sell"), "BUY").otherwise("SELL"),
    )

    # Rollup to (symbol, window): A5, A6, A8, A9, P5 HAVING, D5 — one more
    # shuffle on the 2-key prefix; no joins anywhere in the pipeline.
    recent5 = F.slice(
        F.reverse(F.array_sort(F.flatten(F.collect_list("recent_tf")))), 1, TOP_RECENT
    )
    qty_recent = F.aggregate(
        recent5,
        F.lit("0").cast(DEC),
        lambda acc, x: (acc + x.getField("qty").cast(DEC)).cast(DEC),
    ).cast("double") / F.size(recent5)
    agg = (
        tf_agg.groupBy("symbol", "window_start_s")
        .agg(
            F.count(F.lit(1)).alias("n_timeframes"),
            F.sum("balance_tf").alias("balance"),
            F.sum(F.least(F.col("cnt_all"), F.lit(BUFFER_KEEP))).alias("n_signals"),
            (
                F.sum(F.col("avg_price_tf").cast(DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),  # A8 two-level mean
            (
                F.sum(F.col("vol_tf").cast(DEC)).cast("double") / F.count(F.lit(1))
            ).alias("avg_volatility"),
            # A9: all timeframes' majorities agree ⇔ min == max (maj_side is
            # never null) — algebraic, so no distinct-agg Expand/exchange
            F.when(F.min("maj_side") == F.max("maj_side"), F.lit(1.0))
            .otherwise(F.lit(0.5))
            .alias("alignment"),
            qty_recent.alias("qty_recent"),  # D5 mean qty of 5 most-recent
        )
        .filter(F.col("n_timeframes") >= 2)  # P5
    )

    # D1: action thresholds
    bal = F.col("balance")
    action = (
        F.when(bal > STRONG_BUY_MIN, "STRONG_BUY")
        .when(bal > BUY_MIN, "BUY")
        .when(bal < STRONG_SELL_MAX, "STRONG_SELL")
        .when(bal < SELL_MAX, "SELL")
        .otherwise("HOLD")
    )
    agg = agg.withColumn("action", action)

    # D2: price adjustment
    mult = (
        F.when(F.col("action") == "STRONG_BUY", PRICE_MULT["STRONG_BUY"])
        .when(F.col("action") == "BUY", PRICE_MULT["BUY"])
        .when(F.col("action") == "SELL", PRICE_MULT["SELL"])
        .when(F.col("action") == "STRONG_SELL", PRICE_MULT["STRONG_SELL"])
        .otherwise(F.lit(1.0))
    )

    # D3: confidence = min(1, align*0.4 + min(1,|bal|/10)*0.4 + max(0.3, 1-vol/100)*0.2)
    confidence = F.least(
        F.lit(1.0),
        F.col("alignment") * 0.4
        + F.least(F.lit(1.0), F.abs(bal) / 10.0) * 0.4
        + F.greatest(F.lit(0.3), F.lit(1.0) - F.col("avg_volatility") / 100.0) * 0.2,
    )

    # D4: reason
    reason = (
        F.when(
            F.col("action").startswith("STRONG"),
            F.when(F.col("alignment") > 0.8, "ALIGNED_SIGNALS").otherwise("MOMENTUM_SHIFT"),
        )
        .when(F.col("action").isin("BUY", "SELL"), "ALIGNED_SIGNALS")
        .otherwise(  # HOLD
            F.when(F.col("alignment") < 0.6, "DIVERGENT_SIGNALS").otherwise(
                "INSUFFICIENT_DATA"
            )
        )
    )

    is_hold = F.col("action") == "HOLD"
    return agg.select(
        "symbol",
        F.col("window_start_s").cast("long").alias("window_start_s"),
        F.col("n_timeframes").cast("long").alias("n_timeframes"),
        F.col("n_signals").cast("long").alias("n_signals"),
        F.col("balance").cast("long").alias("balance"),
        F.round("avg_price", round_dp).alias("avg_price"),
        F.col("alignment"),
        F.round("avg_volatility", round_dp).alias("avg_volatility"),
        "action",
        F.when(is_hold, F.lit(0.5))
        .otherwise(F.round(confidence, round_dp))
        .alias("confidence"),
        F.round(F.col("avg_price") * mult, round_dp).alias("suggested_price"),
        # D5: truncate to 4dp (DecisionMaker.kt:125); HOLD → 0.0. Deterministic
        # mode: the uniform(0.9,1.1) factor is fixed to 1.0 (SURVEY.md §7.4.3).
        F.when(is_hold, F.lit(0.0))
        .otherwise(F.floor(F.col("qty_recent") * 10000) / 10000.0)
        .alias("suggested_qty"),
        reason.alias("reason"),
    )


def decisions_from_events(events: DataFrame) -> DataFrame:
    """Flagship query: events fixture → signals → decisions."""
    return decide(signals_from_events(events))


# ---------------------------------------------------------------------------
# D6: full TradingDecision record construction (TradingDecision.kt:10-37)
# ---------------------------------------------------------------------------
def to_decision_records(
    decisions: DataFrame, signals: DataFrame, deterministic: bool = True
) -> DataFrame:
    """Decisions + their embedded ts-descending signal arrays (A7/D6).

    Output matches the reference's wire record: id, symbol, action,
    confidence, suggested_price, suggested_qty, signals (array of signal
    structs, most recent first), timestamp (epoch s of window end), reason.

    A7 faithfulness: the reference embeds the *flattened last-10-per-timeframe
    buffers* (SignalAggregator.kt:42-44), NOT every signal in the window — so
    the array is bounded at |timeframes| x 10 (≤30 here) per decision. We rank
    with the exact window used by decide() (ts desc, signal_id desc) and
    collect only rn <= BUFFER_KEEP: the collect_list is bounded, never a
    per-group scale hazard.

    Deterministic mode derives id from the business key (sha256) and the
    timestamp from the window (SURVEY.md §7.4.3); production mode uses
    uuid()/current_timestamp() like the reference.
    """
    b = signals.withColumn("window_start_s", window_start_s_expr())
    w_tf = Window.partitionBy("symbol", "window_start_s", "timeframe").orderBy(
        F.desc("ts_us"), F.desc("signal_id")
    )
    buf = b.withColumn("rn", F.row_number().over(w_tf)).filter(F.col("rn") <= BUFFER_KEEP)
    sig_arrays = buf.groupBy("symbol", "window_start_s").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct("ts_us", "signal_id", "side", "qty", "price", "timeframe")
                )
            )
        ).alias("signals")  # struct sort is lexicographic on (ts_us, ...) → reverse = desc
    )
    if deterministic:
        dec_id = F.sha2(F.concat_ws("|", F.col("symbol"), F.col("window_start_s")), 256)
        ts = (F.col("window_start_s") + WINDOW_SECONDS).cast("long")
    else:
        dec_id = F.uuid()
        ts = F.unix_timestamp(F.current_timestamp())
    return decisions.join(sig_arrays, ["symbol", "window_start_s"]).select(
        dec_id.alias("id"),
        "symbol",
        "action",
        "confidence",
        "suggested_price",
        "suggested_qty",
        "signals",
        ts.alias("timestamp_s"),
        "reason",
        "window_start_s",
    )
