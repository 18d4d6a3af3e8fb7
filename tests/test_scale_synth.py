"""The synthesized N× bench corpus must scale workloads LINEARLY.

These tests pin the properties that make the sf1 bench section honest
(sources/scale_synth.py): replicas are content-disjoint (so near-dup
candidate counts grow ~N×, not ~N²), intra-replica similarity structure is
the fixture's own (token order / pairwise cosines preserved exactly), and
generation is deterministic + cached. Pure pyarrow/numpy — no Spark session.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from futures_eos_cdc_spark.sources.scale_synth import ID_STRIDE, ensure_scaled_dir

SRC = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scaled") / "x3")
    return ensure_scaled_dir(SRC, out_dir=out, factor=3)


def test_documents_disjoint_and_structure_preserved(scaled):
    src = pq.read_table(f"{SRC}/documents.parquet")
    out = pq.read_table(f"{scaled}/documents.parquet")
    n = src.num_rows
    assert out.num_rows == 3 * n

    src_text = src.column("text").to_pylist()
    out_id = out.column("doc_id").to_pylist()
    out_text = dict(zip(out_id, out.column("text").to_pylist()))

    # replica 0 is the fixture verbatim
    for i, did in enumerate(src.column("doc_id").to_pylist()[:20]):
        assert out_text[did] == src_text[i]

    # replica k: same token ORDER (structure), disjoint token STRINGS
    did0 = src.column("doc_id").to_pylist()[0]
    t0 = out_text[did0].split(" ")
    t1 = out_text[ID_STRIDE + did0].split(" ")
    assert len(t0) == len(t1)
    assert [w + "~1" for w in t0] == t1
    assert set(t0).isdisjoint(set(t1))

    # n_chars recomputed for the rewritten text
    for did, nc, tx in zip(out_id[:50], out.column("n_chars").to_pylist()[:50],
                           out.column("text").to_pylist()[:50]):
        assert nc == len(tx)


def test_embeddings_isometry_and_cross_replica_decorrelation(scaled):
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    out = pq.read_table(f"{scaled}/embeddings.parquet")
    vid = np.asarray(out.column("vec_id").to_pylist())
    emb = np.asarray(out.column("embedding").to_pylist(), dtype=np.float64)
    n = src.num_rows
    assert out.num_rows == 3 * n

    by_id = {int(v): emb[i] for i, v in enumerate(vid)}
    src_ids = src.column("vec_id").to_pylist()[:30]
    # intra-replica pairwise cosines preserved to float32 rounding
    for a, b in zip(src_ids, src_ids[1:]):
        c0 = float(by_id[a] @ by_id[b])
        c1 = float(by_id[ID_STRIDE + a] @ by_id[ID_STRIDE + b])
        c2 = float(by_id[2 * ID_STRIDE + a] @ by_id[2 * ID_STRIDE + b])
        assert abs(c0 - c1) < 1e-5 and abs(c0 - c2) < 1e-5

    # cross-replica: a vector vs its rotated copy is decorrelated in bulk
    # (random rotation in 64-d: E[cos]=0, sd≈1/8 — assert the MEAN is small,
    # individual pairs can legitimately reach ~0.5)
    cs = [abs(float(by_id[a] @ by_id[ID_STRIDE + a])) for a in src_ids]
    assert np.mean(cs) < 0.35


def test_generation_is_deterministic_and_cached(scaled, tmp_path):
    # same inputs → byte-identical parquet content hashes
    other = ensure_scaled_dir(SRC, out_dir=str(tmp_path / "again"), factor=3)
    for t in ("documents", "embeddings"):
        a = pq.read_table(f"{scaled}/{t}.parquet")
        b = pq.read_table(f"{other}/{t}.parquet")
        assert a.equals(b), t

    # marker short-circuits regeneration (mtime unchanged on reuse)
    p = f"{scaled}/documents.parquet"
    mtime = os.path.getmtime(p)
    assert ensure_scaled_dir(SRC, out_dir=scaled, factor=3) == scaled
    assert os.path.getmtime(p) == mtime

    marker = json.load(open(f"{scaled}/_SCALED_OK.json"))
    assert marker["factor"] == 3 and marker["rows"]["documents"] > 0


def test_events_scale_as_later_periods(scaled):
    """Replica k of events is a later disjoint time period with shifted
    event_ids: window count grows linearly, per-(symbol, window) group
    sizes stay the fixture's own, and replica 0 is verbatim."""
    src = pq.read_table(f"{SRC}/events.parquet")
    out = pq.read_table(f"{scaled}/events.parquet")
    n = src.num_rows
    assert out.num_rows == 3 * n

    src_ts = src.column("ts").cast("int64").to_pylist()
    out_ts = out.column("ts").cast("int64").to_pylist()
    out_id = out.column("event_id").to_pylist()
    # replica 0 verbatim
    assert out_ts[:n] == src_ts and out_id[:n] == src.column("event_id").to_pylist()
    # replica 1: ids shifted by ID_STRIDE, time strictly after replica 0
    assert out_id[n] == src.column("event_id").to_pylist()[0] + ID_STRIDE
    assert min(out_ts[n:2 * n]) > max(src_ts)
    # per-replica time STRUCTURE preserved (same inter-event deltas)
    d_src = [b - a for a, b in zip(src_ts, src_ts[1:])]
    d_r1 = [b - a for a, b in zip(out_ts[n:2 * n], out_ts[n + 1:2 * n])]
    assert d_r1 == d_src
    # non-shifted columns copied through
    assert out.column("user_id").to_pylist()[n:2 * n] == src.column("user_id").to_pylist()
