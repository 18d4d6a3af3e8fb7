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
