"""The __main__ CLI: list / run / explain over the shared registry."""

from __future__ import annotations

from futures_eos_cdc_spark.__main__ import main


def test_cli_list_names_every_registered_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out.split()
    from futures_eos_cdc_spark.plans import QUERIES

    assert set(out) == set(QUERIES)


def test_cli_run_and_explain(spark, sf_dir, capsys):
    assert main(["run", "q6_forecast_revenue", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "revenue" in out

    assert main(["explain", "q6_forecast_revenue", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out

    assert main(["run", "no_such_query", "--sf-dir", sf_dir]) == 2


def test_cli_gate_index_maintenance(spark, sf_dir, tmp_path, capsys):
    """The gate-index maintenance front door: info prints the metadata
    and batch count, compact consolidates, gc reports deletions — the
    cron-able cadence the module docstring recommends."""
    import json

    from pyspark.sql import functions as F

    from futures_eos_cdc_spark.operators.gate_index import DedupGateIndex

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    idx = DedupGateIndex.build(corpus, str(tmp_path / "idx"), "exact")
    idx.append(docs.filter(F.col("doc_id") % 2 == 1), token="s/1")

    assert main(["gate-index", "info", str(tmp_path / "idx")]) == 0
    info = json.loads(capsys.readouterr().out)
    assert info["kind"] == "exact" and info["committed_batches"] == 2
    assert info["idempotency_tokens"] == 1 and info["tables"] == ["digests"]

    assert main(["gate-index", "compact", str(tmp_path / "idx")]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["consolidated_bid"] in DedupGateIndex.open(
        str(tmp_path / "idx")
    )._committed()

    # zero grace: the two pre-compaction orphan dirs fall immediately
    assert main(["gate-index", "gc", str(tmp_path / "idx"), "--grace-s", "0"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out["deleted"]) == 2

    assert main(["gate-index", "info", str(tmp_path / "nope")]) == 2
