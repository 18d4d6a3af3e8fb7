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

# S8 EventRouter oracle: rebuild the Spark-side payload BYTE-equal by the
# SAME construction — fixed field order, and numeric fields through
# operators.order_pipeline.canonical_decimal_sql (floor(x·10^dp + 0.5) +
# integer formatting: pure IEEE + integer/string ops, bit-identical in any
# engine). No engine float printer is involved on either side, so the match
# cannot be broken by a JDK or DuckDB upgrade (the r4/r5 hazard: DuckDB's
# double→VARCHAR happening to equal Jackson's shortest-roundtrip). String
# fields are sha-hex / fixed enums / symbols: nothing needs JSON escaping.
from ..operators.order_pipeline import _payload_sql

OUTBOX_ROUTER_ORACLE_SQL = f"""
WITH ord AS ({ORDERS_ORACLE_SQL}),
outbox AS (
  SELECT
    sha256(concat_ws('|', 'outbox', id)) AS event_id,
    'ORDER' AS aggregate_type,
    id AS aggregate_id,
    'ORDER_CREATED' AS type,
    {_payload_sql("//")} AS payload,
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
