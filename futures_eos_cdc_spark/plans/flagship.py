"""Flagship query (Spark + DuckDB oracle): the full signal→decision pipeline.

The DuckDB SQL below is the ANSI re-statement of
operators.signal_pipeline.decide over the same `events` fixture. It mirrors
the engine's determinism rules exactly:

- all sums over doubles go through DECIMAL(38,10) casts (exact arithmetic, so
  partitioning/summation order cannot change the result);
- `price*price` / plain doubles are multiplied as doubles FIRST (bit-identical
  in any engine) and only the product is cast to decimal;
- DuckDB decimal literals are cast to DOUBLE wherever they mix with doubles
  (DuckDB treats `0.5` as DECIMAL; Spark treats it as DOUBLE — an uncast
  literal would silently switch DuckDB into decimal division);
- timestamps are reduced to epoch seconds (BIGINT) — timezone-proof;
- BIGINT casts on every integer aggregate (DuckDB sums INTEGER into HUGEINT).
"""

FLAGSHIP_ORACLE_SQL = """
WITH signals AS (
  SELECT
    event_id AS signal_id,
    CASE user_id % 5
      WHEN 0 THEN 'BTCUSDT' WHEN 1 THEN 'ETHUSDT' WHEN 2 THEN 'SOLUSDT'
      WHEN 3 THEN 'XRPUSDT' ELSE 'NAS100' END AS symbol,
    CASE WHEN event_type IN ('purchase','signup','click') THEN 'BUY'
         ELSE 'SELL' END AS side,
    CAST(event_id % 50 AS DOUBLE) / 100.0 + 0.01 AS qty,
    value AS price,
    CASE event_id % 3 WHEN 0 THEN '1m' WHEN 1 THEN '5m' ELSE '15m' END AS timeframe,
    epoch_us(ts) AS ts_us
  FROM events
),
b AS (
  SELECT *, (ts_us // 300000000) * 300 AS window_start_s
  FROM signals
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY symbol, window_start_s, timeframe
    ORDER BY ts_us DESC, signal_id DESC) AS rn
  FROM b
),
tf_agg AS (
  SELECT symbol, window_start_s, timeframe,
    sum(CASE WHEN side = 'BUY' THEN 1 ELSE -1 END) AS balance_tf,
    count(*) AS cnt_all,
    count(*) FILTER (WHERE rn <= 10) AS cnt_buf,
    sum(CAST(price AS DECIMAL(38,10))) FILTER (WHERE rn <= 10) AS sum_p,
    sum(CAST(price * price AS DECIMAL(38,10))) FILTER (WHERE rn <= 10) AS sum_p2
  FROM r
  GROUP BY 1, 2, 3
),
tf2 AS (
  SELECT *,
    CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / cnt_buf AS avg_price_tf,
    CASE WHEN cnt_buf < 2 THEN CAST(0.0 AS DOUBLE)
         ELSE sqrt(greatest(
           CAST(CAST(sum_p2 AS VARCHAR) AS DOUBLE) / cnt_buf
             - (CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / cnt_buf) * (CAST(CAST(sum_p AS VARCHAR) AS DOUBLE) / cnt_buf),
           CAST(0.0 AS DOUBLE))) END AS vol_tf
  FROM tf_agg
),
side_cnt AS (
  SELECT symbol, window_start_s, timeframe, side, count(*) AS c
  FROM r WHERE rn <= 10
  GROUP BY 1, 2, 3, 4
),
maj AS (
  SELECT symbol, window_start_s, timeframe, side AS maj_side
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY symbol, window_start_s, timeframe
      ORDER BY c DESC, side DESC) AS rs
    FROM side_cnt)
  WHERE rs = 1
),
sym_agg AS (
  SELECT t.symbol, t.window_start_s,
    count(*) AS n_timeframes,
    sum(t.balance_tf) AS balance,
    sum(least(t.cnt_all, 10)) AS n_signals,
    CAST(CAST(sum(CAST(t.avg_price_tf AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_price,
    CAST(CAST(sum(CAST(t.vol_tf AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / count(*) AS avg_volatility,
    CASE WHEN count(DISTINCT m.maj_side) = 1 THEN CAST(1.0 AS DOUBLE)
         ELSE CAST(0.5 AS DOUBLE) END AS alignment
  FROM tf2 t
  JOIN maj m USING (symbol, window_start_s, timeframe)
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
top5 AS (
  SELECT symbol, window_start_s,
    CAST(CAST(sum(CAST(qty AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) / count(*) AS qty_recent
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY symbol, window_start_s
      ORDER BY ts_us DESC, signal_id DESC) AS rq
    FROM r WHERE rn <= 10)
  WHERE rq <= 5
  GROUP BY 1, 2
),
d AS (
  SELECT s.*, t.qty_recent,
    CASE WHEN s.balance > 5 THEN 'STRONG_BUY'
         WHEN s.balance > 2 THEN 'BUY'
         WHEN s.balance < -5 THEN 'STRONG_SELL'
         WHEN s.balance < -2 THEN 'SELL'
         ELSE 'HOLD' END AS action
  FROM sym_agg s
  JOIN top5 t USING (symbol, window_start_s)
)
SELECT
  symbol,
  CAST(window_start_s AS BIGINT) AS window_start_s,
  CAST(n_timeframes AS BIGINT) AS n_timeframes,
  CAST(n_signals AS BIGINT) AS n_signals,
  CAST(balance AS BIGINT) AS balance,
  round(avg_price, 6) AS avg_price,
  alignment,
  round(avg_volatility, 6) AS avg_volatility,
  action,
  CASE WHEN action = 'HOLD' THEN CAST(0.5 AS DOUBLE)
       ELSE round(least(CAST(1.0 AS DOUBLE),
              alignment * 0.4
              + least(CAST(1.0 AS DOUBLE), abs(CAST(balance AS DOUBLE)) / 10.0) * 0.4
              + greatest(CAST(0.3 AS DOUBLE), 1.0 - avg_volatility / 100.0) * 0.2), 6)
       END AS confidence,
  round(avg_price * CASE action
      WHEN 'STRONG_BUY' THEN 0.998 WHEN 'BUY' THEN 0.999
      WHEN 'SELL' THEN 1.001 WHEN 'STRONG_SELL' THEN 1.002
      ELSE 1.0 END, 6) AS suggested_price,
  CASE WHEN action = 'HOLD' THEN CAST(0.0 AS DOUBLE)
       ELSE floor(qty_recent * 10000) / 10000.0 END AS suggested_qty,
  CASE WHEN action IN ('STRONG_BUY','STRONG_SELL') THEN
         (CASE WHEN alignment > 0.8 THEN 'ALIGNED_SIGNALS' ELSE 'MOMENTUM_SHIFT' END)
       WHEN action IN ('BUY','SELL') THEN 'ALIGNED_SIGNALS'
       ELSE (CASE WHEN alignment < 0.6 THEN 'DIVERGENT_SIGNALS'
                  ELSE 'INSUFFICIENT_DATA' END) END AS reason
FROM d
"""

# D6/A7 oracle: the flagship decisions joined with a deterministic string key
# for the embedded last-10-per-timeframe signal buffers. The key encodes
# membership AND order (ts desc, id desc) using only integer/string fields, so
# it hash-compares exactly; the full struct array (incl. double qty/price) is
# covered by pytest shape tests. sha256(symbol|window_start_s) mirrors the
# engine's deterministic id derivation.
DECISION_RECORDS_ORACLE_SQL = f"""
WITH dec AS ({FLAGSHIP_ORACLE_SQL}),
sig AS (
  SELECT
    event_id AS signal_id,
    CASE user_id % 5
      WHEN 0 THEN 'BTCUSDT' WHEN 1 THEN 'ETHUSDT' WHEN 2 THEN 'SOLUSDT'
      WHEN 3 THEN 'XRPUSDT' ELSE 'NAS100' END AS symbol,
    CASE WHEN event_type IN ('purchase','signup','click') THEN 'BUY'
         ELSE 'SELL' END AS side,
    CASE event_id % 3 WHEN 0 THEN '1m' WHEN 1 THEN '5m' ELSE '15m' END AS timeframe,
    epoch_us(ts) AS ts_us
  FROM events
),
rb AS (
  SELECT *, (ts_us // 300000000) * 300 AS window_start_s,
    row_number() OVER (
      PARTITION BY symbol, ts_us // 300000000, timeframe
      ORDER BY ts_us DESC, signal_id DESC) AS rn
  FROM sig
),
keys AS (
  SELECT symbol, window_start_s,
    string_agg(
      CAST(ts_us AS VARCHAR) || ':' || CAST(signal_id AS VARCHAR)
        || ':' || side || ':' || timeframe,
      ';' ORDER BY ts_us DESC, signal_id DESC) AS signals_key,
    CAST(count(*) AS BIGINT) AS n_embedded
  FROM rb
  WHERE rn <= 10
  GROUP BY 1, 2
)
SELECT
  sha256(dec.symbol || '|' || CAST(dec.window_start_s AS VARCHAR)) AS id,
  dec.symbol,
  dec.action,
  dec.confidence,
  dec.suggested_price,
  dec.suggested_qty,
  k.signals_key,
  k.n_embedded,
  CAST(dec.window_start_s + 300 AS BIGINT) AS timestamp_s,
  dec.reason,
  dec.window_start_s
FROM dec
JOIN keys k ON dec.symbol = k.symbol AND dec.window_start_s = k.window_start_s
"""
