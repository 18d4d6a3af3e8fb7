"""Shared Spark-vs-DuckDB comparison used by the oracle parity tests.

Mimics the driver's check: row count + order-insensitive value comparison.
Exact equality is intended — the engine's queries are built so floats are
bit-identical across engines (decimal-exact sums, epoch-seconds timestamps).
"""

from __future__ import annotations

import math

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    # sort columns by name (driver does), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, con, sql: str, allow_empty: bool = False) -> None:
    sdf = spark_df
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"columns differ: {scols} vs {dcols}"
    assert len(srows) == len(drows), f"row count differs: {len(srows)} vs {len(drows)}"
    if not allow_empty:
        assert len(srows) > 0, "query returned no rows — not a meaningful check"

    sn = _norm_rows(scols, srows)
    dn = _norm_rows(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{len(mismatches)} mismatched rows; first: {mismatches[:3]}"
