"""Order-pipeline queries + DuckDB oracles (SURVEY.md §2.2 P7-P16).

The oracle embeds the flagship decision SQL as a subquery and re-states the
order transforms in ANSI SQL. Float parity notes:

- every DECIMAL literal that touches a double is CAST(... AS DOUBLE) so
  DuckDB uses IEEE double ops exactly like Spark;
- sha256 hex (lowercase) is identical in both engines → deterministic ids;
- epoch-seconds clocks derive from the decision window (no wall clock).
"""

from .flagship import FLAGSHIP_ORACLE_SQL

ORDERS_ORACLE_SQL = f"""
WITH decisions AS ({FLAGSHIP_ORACLE_SQL}),
gated AS (
  SELECT *,
    CASE WHEN action LIKE 'STRONG%' THEN confidence * CAST(1.2 AS DOUBLE)
         ELSE confidence END AS adj_confidence
  FROM decisions
  WHERE action IN ('BUY','SELL','STRONG_BUY','STRONG_SELL')
),
g2 AS (
  SELECT * FROM gated WHERE adj_confidence >= CAST(0.65 AS DOUBLE)
),
w AS (
  SELECT *,
    sha256(concat_ws('|', symbol, CAST(window_start_s AS VARCHAR))) AS id
  FROM g2
),
mp(symbol, mkt_price) AS (
  VALUES ('BTCUSDT', CAST(65000.0 AS DOUBLE)), ('ETHUSDT', CAST(3500.0 AS DOUBLE)),
         ('SOLUSDT', CAST(150.0 AS DOUBLE)), ('NAS100', CAST(18500.0 AS DOUBLE))
)
SELECT
  w.id,
  'ORD-' || CAST(w.window_start_s * 1000 AS VARCHAR) || '-' || substring(w.id, 1, 8)
    AS client_order_id,
  w.symbol,
  CASE WHEN w.action IN ('BUY','STRONG_BUY') THEN 'BUY' ELSE 'SELL' END AS side,
  round(CAST(1.0 AS DOUBLE) + CAST(9.0 AS DOUBLE) * least(CAST(1.0 AS DOUBLE),
        greatest(CAST(0.0 AS DOUBLE),
          (w.adj_confidence - CAST(0.65 AS DOUBLE))
            / (CAST(1.0 AS DOUBLE) - CAST(0.65 AS DOUBLE)))), 2) AS qty,
  coalesce(mp.mkt_price, CAST(100.0 AS DOUBLE)) AS price,
  'PENDING' AS status,
  CAST(w.window_start_s AS BIGINT) AS created_at_s,
  CAST(w.window_start_s AS BIGINT) AS updated_at_s,
  w.confidence,
  w.adj_confidence
FROM w
LEFT JOIN mp ON w.symbol = mp.symbol
"""

# S8 EventRouter oracle: rebuild the Spark-side `to_json(struct(...))`
# payload BYTE-equal by string concatenation (fixed field order, no spaces —
# Jackson's compact layout). Doubles (qty/price/confidence) render via
# DuckDB's double→VARCHAR, which is shortest-roundtrip decimal exactly like
# Java's Double.toString in the plain-notation range these values occupy
# (qty ∈ [1,10] 2dp, price ∈ {dim values, 100.0}, confidence ∈ [0.65, 1.2))
# — verified byte-for-byte by the driver's hash compare. String fields are
# sha-hex / fixed enums / symbols: nothing needs JSON escaping.
# Environment note: pre-JDK-19 Double.toString is not shortest-roundtrip for
# EVERY double (JDK-4511638); the values this pipeline produces render
# identically on this JDK (empirically hash-matched at both fixture SFs),
# but a port to another JRE should re-verify or normalize the rendering
# (e.g. format_number) rather than assume it.
OUTBOX_ROUTER_ORACLE_SQL = f"""
WITH ord AS ({ORDERS_ORACLE_SQL}),
outbox AS (
  SELECT
    sha256(concat_ws('|', 'outbox', id)) AS event_id,
    'ORDER' AS aggregate_type,
    id AS aggregate_id,
    'ORDER_CREATED' AS type,
    '{{"orderId":"' || id
      || '","clientOrderId":"' || client_order_id
      || '","symbol":"' || symbol
      || '","side":"' || side
      || '","qty":' || CAST(qty AS VARCHAR)
      || ',"price":' || CAST(price AS VARCHAR)
      || ',"status":"' || status
      || '","confidence":' || CAST(confidence AS VARCHAR)
      || '}}' AS payload,
    CAST(created_at_s * 1000 AS BIGINT) AS occurred_at_ms
  FROM ord
)
SELECT
  aggregate_id AS key,
  payload AS value,
  'trading.' || lower(aggregate_type) || 's' AS topic,
  event_id AS header_event_id,
  type AS header_event_type,
  occurred_at_ms AS header_occurred_at_ms
FROM outbox
"""
