"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_query_wall_clock", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Execution is measured with the `noop` sink (full plan executes, no driver
collect overhead). Methodology: each query is executed once untimed (warm-up:
Catalyst analysis + whole-stage-codegen compile + JIT + broadcast build — all
per-plan one-time costs), then the timed run measures steady-state execution,
the figure that scales with data volume. First-run overhead is flat per query
(~1-3 s JVM compile) regardless of SF, so it would swamp the data-dependent
signal at small SFs; steady state is what a 100 TB run is made of.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from futures_eos_cdc_spark.plans import QUERIES  # noqa: E402
from futures_eos_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)

    spark = get_spark(
        "futures_eos_cdc_spark-bench",
        cpus=cpus,
        shuffle_partitions=cpus,
        # Keep stdout byte-clean: Spark's console progress bar writes \r
        # spinner frames that the driver's tail-capture interleaves with the
        # result line (the round-1 artifact was 2000 chars of pure spinner).
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    # Warm up the JVM / parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in sorted(QUERIES.items()):
        # One broken query must not zero out the round's perf signal:
        # record the error and keep going (lesson of round 1).
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
            # min of two timed runs: JVM JIT keeps compiling through the
            # first post-warm-up execution on expression-heavy plans
            # (text_stats: 6.7 → 0.9 → 0.5 s across identical fresh plans),
            # and a single sample sometimes lands on that slope. The min is
            # the steady-state figure — the one that scales with data.
            best = None
            for _ in range(2):
                # Drop cached intermediates so each timed run measures the
                # query's own computation (operators may persist() shared
                # subplans WITHIN a query — that stays; cross-run cache
                # reuse would not be honest).
                spark.catalog.clearCache()
                # Plan CONSTRUCTION is inside the timed window: iterative
                # operators (connected_components' checkpointed rounds)
                # legitimately execute jobs while building their result —
                # timing only the final action would hide their real cost
                # (dedup_clusters measured 0.1 s construction-excluded vs
                # ~4 s honest at 10× SF). For ordinary lazy queries this
                # adds only Catalyst analysis, a few ms.
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        result["errors"] = errors

    # Optional: time the DuckDB oracles on the same tables for the
    # BASELINE.md "within 2x of the oracle engine" comparison.
    if os.environ.get("SPARK_GRAFT_BENCH_DUCKDB") == "1":
        import duckdb

        from futures_eos_cdc_spark.plans import ORACLES
        from futures_eos_cdc_spark.plans.dataprep import oracle_overrides_for_sf

        # The IVF-family oracles bake the trained model's auto-derived cell
        # count (a function of the embeddings row count) into their SQL —
        # re-render them for THIS SF so both engines replay the same model.
        oracles = {**ORACLES, **oracle_overrides_for_sf(sf_dir)}
        con = duckdb.connect()
        con.execute(f"SET threads TO {cpus}")
        for t in (
            "region nation customer supplier part orders lineitem events "
            "documents embeddings".split()
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        duck: dict[str, float] = {}
        for name, sql in sorted(oracles.items()):
            con.execute(sql).fetchall()  # warm-up (buffer pool)
            best = None
            for _ in range(2):  # min-of-2, symmetric with the Spark side
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            duck[name] = round(best, 3)
        result["duckdb_queries"] = duck
        result["duckdb_total"] = round(sum(duck.values()), 3)
        # Apples-to-apples: both totals over the SAME key set — queries that
        # ran on BOTH engines (rows-only queries have no DuckDB counterpart;
        # a Spark-side error must drop the oracle's time too, or the headline
        # ratio silently skews in Spark's favor).
        matched = set(timings) & set(duck)
        result["oracle_matched_spark_total"] = round(
            sum(timings[k] for k in matched), 3
        )
        result["oracle_matched_duckdb_total"] = round(
            sum(duck[k] for k in matched), 3
        )
        if result["oracle_matched_duckdb_total"] > 0:
            result["spark_vs_duckdb_ratio"] = round(
                result["oracle_matched_spark_total"]
                / result["oracle_matched_duckdb_total"],
                3,
            )

    # sf1 section: the nine heaviest queries on a deterministic 10× corpus —
    # the data-dominated regime the sf0.1 totals can't show (most queries
    # there sit on the ~0.3-0.6 s task-scheduling floor). Gated to the
    # driver's default sf0.1 run; SPARK_GRAFT_BENCH_SF1=0 disables.
    #
    # Runs in a FRESH SUBPROCESS with its own SparkSession (r9 VERDICT
    # wrong #1 / next #2): the JVM that just executed all ~116 registry
    # queries carries heap, broadcast, and Python-worker pressure that an
    # advisory System.gc() demonstrably does not clear under driver
    # conditions (ngram at 10x: 30.6 s in the r9 driver artifact vs
    # 10.7-11.2 s fresh). The main session is STOPPED first so the two
    # JVMs never compete for the box.
    if sf == 0.1 and os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") == "1":
        spark.stop()
        result["sf1"] = run_sf1_subprocess(sf_dir)

    emit(result)


def run_sf1_subprocess(sf_dir: str) -> dict:
    """Launch ``bench.py --sf1 <sf_dir>`` as a child process and parse
    its one-line JSON result. The child builds its own SparkSession in a
    new JVM — steady-state numbers, not post-116-query heap pressure."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sf1", sf_dir],
            capture_output=True,
            text=True,
            timeout=1200,
            env={**os.environ, "SPARK_GRAFT_BENCH_SF1": "0"},
        )
    except subprocess.TimeoutExpired:
        return {"error": "sf1 subprocess timed out (1200s)"}
    except Exception as exc:  # noqa: BLE001 — sf1 is additive evidence:
        # a fork/exec failure (plausible on a memory-pressured box right
        # after the full registry run) must not lose the whole round's
        # sf0.1 artifact by crashing main() before emit()
        return {"error": f"sf1 subprocess spawn: {type(exc).__name__}: {exc}"[:300]}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                break
    return {
        "error": (
            f"sf1 subprocess rc={proc.returncode}; no JSON on stdout; "
            f"stderr tail: {proc.stderr[-200:]}"
        )[:300]
    }


def sf1_child_main(sf_dir: str) -> None:
    """Child-process entry (``--sf1``): fresh session, run the section,
    print ONE JSON line."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    spark = get_spark(
        "futures_eos_cdc_spark-bench-sf1",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    try:
        out = bench_sf1(spark, sf_dir, cpus)
    except Exception as exc:  # noqa: BLE001 — sf1 is additive evidence
        out = {"error": f"{type(exc).__name__}: {exc}"[:300]}
    sys.stdout.flush()
    print(json.dumps(out), flush=True)


# Heaviest data-dominated queries, cheapest DuckDB side first so a budget
# stop keeps the most comparisons. r12 VERDICT next #2 added the retrieval
# family + exactsubstr_gram_cut (the four worst sf0.1 floor-ratio queries)
# so their ">2x at sf0.1 is scheduling floor, flips with data" defense is
# MEASURED cross-engine, not extrapolated from Spark-only decade rows.
SF1_QUERIES = [
    "token_blocks",
    "corpus_token_stats",
    "text_stats",
    "bm25_topk_retrieval",
    "hybrid_rrf_retrieval",
    "hard_negative_mining",
    "exactsubstr_gram_cut",
    "minhash_lsh_near_dup",
    "dedup_clusters",
    "simhash64_hamming_near_dup",
    "ann_cosine_lsh",
    # ngram LAST: its sf1 oracle exceeds the 170 s interrupt (measured
    # r13), and a doomed oracle mid-list starves the queries behind it
    # of budget (r13 run 1 skipped quality_classifier for exactly this)
    "quality_classifier_scores",
    "ngram_jaccard_near_dup",
]
# Measured on this box (32 threads): Spark warm+timed ≈ 57 s for the
# original nine; DuckDB 1+2.4+3.9+7.4+12.6+43+~75+79+129 ≈ 355 s
# (simhash64's oracle replays the 64-term bit voting per doc;
# quality_classifier replays the hashed-weight model row-wise — r6
# additions). The r13 additions are ~25 s Spark (incl. the one-time
# retrieval-core build, which the first retrieval query's warm-up pays —
# disclosed in BENCH_NOTES) + ~40 s DuckDB. Budget 640 s admits the full
# duck pass with headroom; the per-oracle interrupt caps any one
# regression; the subprocess's own 1200 s ceiling still clears.
SF1_BUDGET_SEC = 640.0  # stop STARTING new work past this
SF1_DUCK_TIMEOUT_SEC = 170.0  # per-oracle interrupt


def bench_sf1(spark, sf_dir: str, cpus: int) -> dict:
    """Spark vs DuckDB on the synthesized 10× corpus (see
    sources/scale_synth.py: replica texts are token-SUFFIXED into disjoint
    replicas so near-dup density scales linearly — a faithful 10× workload,
    not an N² pair explosion; permutation is explicitly rejected there
    because the fixture's shingle space saturates). Spark: warm-up + MIN
    OF TWO timed runs (r9 VERDICT next #2 — symmetric with the sf0.1
    loop). DuckDB: one run per oracle under an interrupt timeout (its
    sf1 pass alone is ~350 s; doubling it would blow the budget, and the
    buffer pool carries no cross-query JIT slope to guard against).

    CONTRACT: call this in a FRESH SparkSession (the --sf1 subprocess
    does) — the r9 driver artifact measured one query 3x slower in the
    JVM that had just run the full registry, and in-place hygiene
    (unpersist + clearCache + System.gc) demonstrably did not protect
    the driver's run."""
    import threading

    from futures_eos_cdc_spark.plans import ORACLES
    from futures_eos_cdc_spark.plans.dataprep import oracle_overrides_for_sf
    from futures_eos_cdc_spark.sources.scale_synth import ensure_scaled_dir

    t_section = time.perf_counter()
    sf1_dir = ensure_scaled_dir(sf_dir, factor=10)
    oracles = {**ORACLES, **oracle_overrides_for_sf(sf1_dir)}
    out: dict = {"dir": sf1_dir, "factor": 10, "spark": {}, "duckdb": {}}

    for name in SF1_QUERIES:
        if time.perf_counter() - t_section > SF1_BUDGET_SEC:
            out.setdefault("skipped", []).append(name)
            continue
        try:
            fn = QUERIES[name]
            fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                # construction inside the window — same honesty rule as
                # the main loop (eager iterative operators)
                t0 = time.perf_counter()
                fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out["spark"][name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            out.setdefault("errors", {})[name] = (
                f"spark {type(exc).__name__}: {exc}"[:200]
            )
            spark.catalog.clearCache()

    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    # every fixture table exists in the scaled dir (non-scaled tables are
    # copied through), so register them all — an SF1_QUERIES addition whose
    # oracle touches another table must not fail on a missing view
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf1_dir}/{t}.parquet')"
        )
    for name in SF1_QUERIES:
        if name not in out["spark"]:
            continue
        if time.perf_counter() - t_section > SF1_BUDGET_SEC:
            out.setdefault("skipped", []).append(f"duckdb:{name}")
            continue
        timer = threading.Timer(SF1_DUCK_TIMEOUT_SEC, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(oracles[name]).fetchall()
            out["duckdb"][name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            # The interrupt lands as a generic exception — but so would a
            # genuine oracle error (missing view, binder error after an
            # oracle edit). Classify by elapsed time so a real failure is
            # surfaced with its message instead of masquerading as a
            # timeout and silently shrinking the compared set.
            dt = time.perf_counter() - t0
            if dt >= SF1_DUCK_TIMEOUT_SEC * 0.95:
                out.setdefault("duck_timeouts", {})[name] = round(dt, 1)
            else:
                out.setdefault("errors", {})[name] = (
                    f"duckdb {type(exc).__name__}: {exc}"[:200]
                )
        finally:
            timer.cancel()
    con.close()

    matched = set(out["spark"]) & set(out["duckdb"])
    out["spark_total"] = round(sum(out["spark"][k] for k in matched), 3)
    out["duckdb_total"] = round(sum(out["duckdb"][k] for k in matched), 3)
    if out["duckdb_total"] > 0:
        out["ratio"] = round(out["spark_total"] / out["duckdb_total"], 3)
    return out


# The driver records only the LAST 2000 characters of stdout and parses the
# JSON line out of that window (BENCH_r03.json: a 2305-char full-fidelity
# line was front-truncated → "parsed": null). Budget the stdout line to fit
# the window with headroom; full fidelity goes to BENCH_FULL.json + stderr.
_STDOUT_BUDGET = 1800


def emit(result: dict) -> None:
    """Write full results to BENCH_FULL.json + stderr; print ONE compact
    JSON line (≤ _STDOUT_BUDGET chars) as the only stdout output.

    The compact line keeps the contract keys (metric/value/unit/queries/sf)
    and fills ``queries`` slowest-first until the budget is spent — the
    slowest queries are the perf signal; the complete per-query map is in
    the committed ``BENCH_FULL.json`` (pointer included in the line).
    """
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(result), file=sys.stderr)

    slim = {k: result[k] for k in ("metric", "value", "unit") if k in result}
    slim["queries"] = {}
    slim["sf"] = result.get("sf")
    slim["full"] = "BENCH_FULL.json"
    for k in (
        "spark_vs_duckdb_ratio",
        "oracle_matched_spark_total",
        "oracle_matched_duckdb_total",
    ):
        if k in result:
            slim[k] = result[k]
    sf1 = result.get("sf1")
    if isinstance(sf1, dict) and "spark" in sf1:
        # compact per-query evidence of the data-dominated regime; full
        # detail (dir, skips, timeouts) stays in BENCH_FULL.json
        slim["sf1"] = {
            "spark": {k: round(v, 2) for k, v in sf1["spark"].items()},
            "duckdb": {k: round(v, 2) for k, v in sf1["duckdb"].items()},
        }
        for k in ("spark_total", "duckdb_total", "ratio"):
            if k in sf1:
                slim["sf1"][k] = sf1[k]
    elif isinstance(sf1, dict) and "error" in sf1:
        slim["sf1"] = {"error": sf1["error"][:120]}
    if result.get("errors"):
        slim["errors_count"] = len(result["errors"])
    timings = result.get("queries", {})
    slim["queries_omitted"] = 0
    base_len = len(json.dumps(slim, separators=(",", ":")))
    # worst-case growth of the omitted counter once entries stop fitting
    budget = _STDOUT_BUDGET - base_len - len(str(len(timings)))
    by_cost = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    used = 0
    for name, sec in by_cost:
        entry = len(name) + len(json.dumps(round(sec, 2))) + 4  # "":x,
        if used + entry > budget:
            slim["queries_omitted"] += 1
            continue
        slim["queries"][name] = round(sec, 2)
        used += entry
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) > _STDOUT_BUDGET and "sf1" in slim and "spark" in slim["sf1"]:
        # degrade rather than die: keep the sf1 totals/ratio, drop the
        # per-query detail (it lives in BENCH_FULL.json)
        slim["sf1"] = {
            k: slim["sf1"][k]
            for k in ("spark_total", "duckdb_total", "ratio")
            if k in slim["sf1"]
        }
        line = json.dumps(slim, separators=(",", ":"))
    assert len(line) <= _STDOUT_BUDGET, len(line)
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--sf1":
        sf1_child_main(sys.argv[2])
    else:
        main()
