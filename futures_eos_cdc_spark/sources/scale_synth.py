"""Deterministic corpus up-scaling for data-dominated benchmarking.

The driver's fixtures stop at sf0.1, where most queries sit on the per-query
task-scheduling floor (~0.3-0.6 s) and engine ratios say little. To measure
the data-dominated regime, this module synthesizes an N× corpus from an
existing fixture dir — deterministically (seeded/content-derived) and with
**linear** workload scaling, which requires care:

Naive row replication is wrong twice over. Replicated texts are exact/near
duplicates of their source, so every doc gains N-1 high-similarity partners
and near-dup candidate pairs explode ~N². Even *permuting* each replica's
tokens fails: the fixture's vocabulary is tiny (~30 words, ~27k distinct
3-shingles at sf0.1), so shingle space SATURATES — measured Σ C(df,2) over
shingle buckets grows 100× for a 10× permuted corpus. Real corpora grow by
adding new content (new topics, domains, time ranges), so their shingle
diversity grows with size and near-dup density stays roughly constant.

The faithful model is therefore **disjoint replicas**:

- **documents**: replica k rewrites every token w → "w~k". Within a
  replica, token order and co-occurrence are untouched, so each replica
  carries exactly the fixture's own near-dup structure (the natural pairs
  the dedup family must find — no artificial injection needed); across
  replicas every shingle string differs, so cross-replica Jaccard is 0.
  Distinct shingles grow ~N×, Σ C(df,2) grows ~N× — linear, like a corpus
  that grew by new content.
- **embeddings**: replica k applies a seeded random orthogonal rotation
  Q_k (QR of a Gaussian matrix). An isometry preserves every intra-replica
  cosine exactly — the fixture's cluster and near-dup structure verbatim —
  while cross-replica cosines concentrate near 0 (random 64-d directions).
  Query ids (vec_id < 5) keep their original vectors in replica 0.
- all other tables are copied through unchanged (the heavy scaled-corpus
  queries only read documents/embeddings).

Generation is driver-local pyarrow/numpy — at bench scale (tens of MB) that
is the right tool; a real 100 TB upscale would run the same per-replica
transform as a Spark ``mapInPandas`` over (replica × input-split) tasks,
embarrassingly parallel because every output row depends on one input row
plus seeded constants.

Results are cached: a marker file records (src, factor, seed); matching
markers skip regeneration.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

ID_STRIDE = 10_000_000
SEED = 20260814


def _scale_documents(src: str, dst: str, factor: int) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()
    n = len(doc_id)

    out_id: list[int] = list(doc_id)
    out_text: list[str] = list(text)
    out_lang: list[str] = list(lang)
    out_src: list[str] = list(source)
    for k in range(1, factor):
        tag = f"~{k}"
        for i in range(n):
            out_id.append(k * ID_STRIDE + doc_id[i])
            out_text.append(
                " ".join(w + tag for w in text[i].split(" "))
            )
            out_lang.append(lang[i])
            out_src.append(source[i])

    table = pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_src, pa.string()),
            "n_chars": pa.array([len(s) for s in out_text], pa.int64()),
        }
    )
    pq.write_table(table, dst)
    return table.num_rows


def _scale_embeddings(src: str, dst: str, factor: int, seed: int) -> int:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    vec_id = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    label = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    n, dim = emb.shape

    ids = [vec_id]
    vecs = [emb.astype(np.float32)]
    labels = [label]
    for k in range(1, factor):
        rng = np.random.default_rng(seed * 2000 + k)
        q, r = np.linalg.qr(rng.standard_normal((dim, dim)))
        q *= np.sign(np.diag(r))  # make the rotation draw sign-canonical
        v = emb @ q
        # re-normalize: float rounding off the exact isometry is ~1e-16
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        ids.append(k * ID_STRIDE + vec_id)
        vecs.append(v.astype(np.float32))
        labels.append(label)

    all_vecs = np.concatenate(vecs)
    table = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
            "embedding": pa.array(
                [row for row in all_vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(np.concatenate(labels), pa.int32()),
        }
    )
    pq.write_table(table, dst)
    return table.num_rows


def _scale_events(src: str, dst: str, factor: int) -> int:
    """Replica k of the event stream is a LATER TIME PERIOD: ts shifts by
    k x (fixture span + 1 h) and event_id by k x ID_STRIDE. That is the
    streaming-history scaling mode — the symbol set stays fixed (the
    reference trades a fixed instrument universe) while the
    (symbol, window, timeframe) group count grows linearly with data, so
    per-group state (the last-10 buffers, OHLCV candles, session gaps)
    stays bounded exactly as it does on a longer real feed. Added in
    round 12 for the flagship family's scaling rows (r11 VERDICT next
    #3); before that the events table was copied through unchanged."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(src)
    ts = t.column("ts")
    span = (
        pc.max(ts).cast(pa.int64()).as_py() - pc.min(ts).cast(pa.int64()).as_py()
    )
    # the 1 h gap in the COLUMN'S OWN unit — fixtures exist in both us and
    # ns (sources/tables.py normalizes ns on read); a hardcoded-us constant
    # would make the gap 3.6 ms on a ns fixture (code-review r12)
    per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
    shift = span + 3_600 * per_s  # + 1 h gap between replicas
    chunks = [t]
    for k in range(1, factor):
        chunks.append(
            t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pc.add(t.column("event_id"), k * ID_STRIDE),
            ).set_column(
                t.schema.get_field_index("ts"),
                "ts",
                pc.add(ts.cast(pa.int64()), k * shift).cast(ts.type),
            )
        )
    out = pa.concat_tables(chunks)
    pq.write_table(out, dst)
    return out.num_rows


def ensure_scaled_dir(
    src_dir: str,
    out_dir: str | None = None,
    factor: int = 10,
    seed: int = SEED,
) -> str:
    """Synthesize (or reuse) a ``factor``× fixture dir derived from
    ``src_dir``; returns the output dir. Idempotent via a marker file."""
    if out_dir is None:
        base = os.path.basename(src_dir.rstrip("/"))
        out_dir = f"/tmp/spark_graft_scaled/{base}_x{factor}_s{seed}"
    marker = os.path.join(out_dir, "_SCALED_OK.json")
    want = {
        "src": os.path.abspath(src_dir),
        "factor": factor,
        "seed": seed,
        "model": "disjoint-replicas-v3",  # v3: events scale (later periods)
    }
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                have = json.load(f)
            if {k: have.get(k) for k in want} == want:
                return out_dir
        except (OSError, ValueError):
            pass
    # Generate into a staging dir, then atomically rename into place: two
    # processes racing on the same cache path (e.g. a bench run and a test
    # session) must never interleave half-written parquet under a dir the
    # other is reading. The loser of the rename race just uses the winner's
    # output.
    stage = f"{out_dir}.stage.{os.getpid()}"
    os.makedirs(stage, exist_ok=True)
    counts = {
        "documents": _scale_documents(
            f"{src_dir}/documents.parquet", f"{stage}/documents.parquet",
            factor,
        ),
        "embeddings": _scale_embeddings(
            f"{src_dir}/embeddings.parquet", f"{stage}/embeddings.parquet",
            factor, seed,
        ),
        "events": _scale_events(
            f"{src_dir}/events.parquet", f"{stage}/events.parquet", factor
        ),
    }
    for name in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem",
    ):
        shutil.copyfile(f"{src_dir}/{name}.parquet", f"{stage}/{name}.parquet")
    with open(os.path.join(stage, "_SCALED_OK.json"), "w") as f:
        json.dump({**want, "rows": counts}, f)
    try:
        os.rename(stage, out_dir)
    except OSError:
        # a concurrent generator won the race (or a stale dir exists):
        # keep theirs if valid, else replace it with ours
        try:
            with open(marker) as f:
                have = json.load(f)
            valid = {k: have.get(k) for k in want} == want
        except (OSError, ValueError):
            valid = False
        if valid:
            shutil.rmtree(stage, ignore_errors=True)
        else:
            # Move the invalid/stale dir ASIDE, then install the stage
            # (ADVICE r5): an in-place rmtree would yank files from under a
            # concurrent reader mid-scan over the stale dir; after the
            # aside-rename that reader finishes against the renamed inode
            # paths it already opened, and only then is the junk deleted.
            aside = f"{out_dir}.stale.{os.getpid()}.{uuid.uuid4().hex[:6]}"
            try:
                os.rename(out_dir, aside)
            except FileNotFoundError:
                aside = None
            os.rename(stage, out_dir)
            if aside:
                shutil.rmtree(aside, ignore_errors=True)
    return out_dir
