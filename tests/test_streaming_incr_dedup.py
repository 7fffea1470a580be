"""streaming_incremental_dedup: cross-micro-batch dup-drop equals the
batch operator (curation.incremental_dedup) on replayed batches.

Replay harness as in test_streaming_curation.py: time-ordered parquet
files + maxFilesPerTrigger=1 + availableNow, delta files in doc_id
order so arrival order == id order (the batch operator's earlier-wins
rule).  The pair stream is aggregated into per-doc verdicts and
compared column-for-column against incremental_dedup's output."""

import os
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.curation import incremental_dedup
from pandas_sigproc_spark.streaming import streaming_incremental_dedup

SCHEMA = "doc_id long, text string"


def _mk_text(rng, n_words=40):
    vocab = [
        "spark", "table", "scan", "merge", "row", "batch", "value",
        "hash", "band", "probe", "shuffle", "join", "digest", "plan",
    ]
    return " ".join(rng.choice(vocab) for _ in range(n_words))


def _corpus_and_delta():
    rng = random.Random(83)
    corpus_texts = [_mk_text(rng) for _ in range(6)]
    near_of_c2 = corpus_texts[2].replace("spark", "flink", 1)

    # delta in id order; batch 1 = ids 100..105, batch 2 = ids 106..111
    delta = [
        (100, corpus_texts[0]),          # exact dup of corpus doc
        (101, near_of_c2),               # near dup of corpus doc
        (102, _mk_text(rng)),            # unique; exact-twinned by 107
        (103, _mk_text(rng)),            # unique; near-dupped by 108
        (104, _mk_text(rng)),            # unique
        (105, corpus_texts[1]),          # exact dup of corpus doc
        # ---- micro-batch boundary: dups below must hit batch-1 state
        (106, _mk_text(rng)),            # unique
        (107, None),                     # exact dup of 102 (cross-batch)
        (108, None),                     # near dup of 103 (cross-batch)
        (109, _mk_text(rng)),            # unique
        (110, None),                     # exact dup of 104 (SAME batch as 104? no — cross)
        (111, _mk_text(rng)),            # unique
    ]
    by_id = {i: t for i, t in delta}
    by_id[107] = by_id[102]
    by_id[108] = by_id[103].replace("table", "chair", 1)
    by_id[110] = by_id[104]
    delta = [(i, by_id[i]) for i, _ in delta]
    return (
        pd.DataFrame({"doc_id": range(6), "text": corpus_texts}),
        pd.DataFrame({"doc_id": [i for i, _ in delta],
                      "text": [t for _, t in delta]}),
    )


def _write_batches(tmp_path, delta, split_at=106):
    """Split ``delta`` into micro-batch files at the given id boundary
    (or a list of boundaries for >2 batches), in id order."""
    root = str(tmp_path / "incr_stream")
    os.makedirs(root, exist_ok=True)
    bounds = [split_at] if isinstance(split_at, int) else list(split_at)
    edges = [-(10**9)] + bounds + [10**9]
    parts = [
        delta[(delta.doc_id >= lo) & (delta.doc_id < hi)]
        for lo, hi in zip(edges, edges[1:])
    ]
    for i, part in enumerate(parts):
        path = os.path.join(root, f"part-{i:03d}.parquet")
        part.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
    return root


def _pairs_to_verdicts(pairs: pd.DataFrame, delta: pd.DataFrame) -> pd.DataFrame:
    """Replay the pair stream into the batch operator's per-doc columns:
    distinct (d_id, match_id) per src; is_exact_dup = any exact pair."""
    uniq = pairs.drop_duplicates(["d_id", "match_id", "src"])
    n_ex = (
        uniq[uniq.src == "corpus"].groupby("d_id").size().rename("n_near_existing")
    )
    n_dl = (
        uniq[uniq.src == "stream"].groupby("d_id").size()
        .rename("n_near_delta_earlier")
    )
    ex_dup = uniq[uniq.is_exact].groupby("d_id").size().rename("_nx")
    out = pd.DataFrame({"doc_id": delta.doc_id.to_numpy()}).set_index("doc_id")
    out = out.join(n_ex).join(n_dl).join(ex_dup).fillna(0).reset_index()
    out["is_exact_dup"] = out.pop("_nx") > 0
    out["n_near_existing"] = out.n_near_existing.astype("int64")
    out["n_near_delta_earlier"] = out.n_near_delta_earlier.astype("int64")
    out["kept"] = (
        ~out.is_exact_dup
        & (out.n_near_existing == 0)
        & (out.n_near_delta_earlier == 0)
    )
    cols = ["doc_id", "is_exact_dup", "n_near_existing",
            "n_near_delta_earlier", "kept"]
    return out[cols].sort_values("doc_id", ignore_index=True)


@pytest.mark.parametrize(
    "split_at",
    [106, [103, 107, 110]],
    ids=["two-batches", "four-batches"],
)
def test_stream_equals_batch_across_micro_batches(spark, tmp_path, split_at):
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)

    expected = (
        incremental_dedup(existing, spark.createDataFrame(delta, SCHEMA))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # fixture sanity: the interesting rows actually fire, incl. both
    # cross-micro-batch dups (107 exact-of-102, 108 near-of-103)
    byid = expected.set_index("doc_id")
    assert bool(byid.loc[100, "is_exact_dup"])
    assert byid.loc[101, "n_near_existing"] >= 1
    assert bool(byid.loc[107, "is_exact_dup"])
    assert byid.loc[107, "n_near_delta_earlier"] >= 1
    assert byid.loc[108, "n_near_delta_earlier"] >= 1
    assert bool(byid.loc[106, "kept"]) and bool(byid.loc[111, "kept"])

    sink = f"incr_dedup_pairs_{len(split_at) if isinstance(split_at, list) else 1}"
    root = _write_batches(tmp_path, delta, split_at)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    out = streaming_incremental_dedup(stream, existing)
    q = (
        out.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    pairs = spark.sql(f"select * from {sink}").toPandas()
    got = _pairs_to_verdicts(pairs, delta)
    pd.testing.assert_frame_equal(got, expected[got.columns.tolist()]
                                  .sort_values("doc_id", ignore_index=True))


def test_batch_fallback_equals_stream_pairs(spark, tmp_path):
    """The operator's batch path (df not streaming) must emit the same
    distinct pair set as the replayed stream."""
    corpus, delta = _corpus_and_delta()
    existing = spark.createDataFrame(corpus, SCHEMA)
    batch_pairs = (
        streaming_incremental_dedup(spark.createDataFrame(delta, SCHEMA), existing)
        .toPandas()
        .drop_duplicates(["d_id", "match_id", "src"])
        .sort_values(["d_id", "match_id", "src"], ignore_index=True)
        [["d_id", "match_id", "src", "is_exact"]]
    )

    root = _write_batches(tmp_path, delta)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        streaming_incremental_dedup(stream, existing)
        .writeStream.format("memory")
        .queryName("incr_dedup_pairs_fb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_pairs = (
        spark.sql("select * from incr_dedup_pairs_fb")
        .toPandas()
        .drop_duplicates(["d_id", "match_id", "src"])
        .sort_values(["d_id", "match_id", "src"], ignore_index=True)
        [["d_id", "match_id", "src", "is_exact"]]
    )
    pd.testing.assert_frame_equal(stream_pairs, batch_pairs)


def test_state_cap_guard_fires(spark, tmp_path):
    """A degenerate band key (many identical docs) must fail loudly with
    the exact-dedup-first remediation, not accrete unbounded state."""
    corpus, _ = _corpus_and_delta()
    existing = spark.createDataFrame(corpus[:1], SCHEMA)
    same = "alpha beta gamma delta epsilon zeta eta theta " * 4
    delta = pd.DataFrame({"doc_id": range(200, 206), "text": [same] * 6})
    root = _write_batches(tmp_path, delta, split_at=203)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    q = (
        streaming_incremental_dedup(stream, existing, max_state_rows_per_key=2)
        .writeStream.format("memory")
        .queryName("incr_dedup_guard")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="max_state_rows_per_key"):
        q.awaitTermination(180)
        raise AssertionError("query should have failed on the state cap")


def test_batch_fallback_applies_state_cap(spark):
    """The batch-fallback path must enforce the same per-key cap as the
    streaming path — and refuse BEFORE the quadratic compare."""
    corpus, _ = _corpus_and_delta()
    existing = spark.createDataFrame(corpus[:1], SCHEMA)
    same = "alpha beta gamma delta epsilon zeta eta theta " * 4
    delta = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(300, 306), "text": [same] * 6}), SCHEMA
    )
    with pytest.raises(Exception, match="max_state_rows_per_key"):
        streaming_incremental_dedup(
            delta, existing, max_state_rows_per_key=2
        ).collect()


def test_null_text_document_gets_signature_not_crash(spark):
    # NULL-text documents must flow through (batch-core parity: NULL
    # coalesces to '' so every doc gets a digest/signature) — the old
    # stream _prep produced NULL sigs whose rows crash-looped the
    # stateful op (a review finding).
    import pandas as pd

    from pandas_sigproc_spark.streaming import streaming_incremental_dedup

    delta = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [10, 11, 12], "text": [None, "", "hello world one"]}
        )
    )
    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": [None]})
    )
    rows = streaming_incremental_dedup(
        delta, corpus, near_threshold=0.5
    ).collect()
    # NULL and '' share one signature: doc 10 matches corpus doc 1
    # (exact) and doc 11 matches both — no crash, verdicts for all
    assert any(
        r["d_id"] == 10 and r["match_id"] == 1 and r["is_exact"] for r in rows
    )
    assert any(r["d_id"] == 11 and r["src"] == "stream" for r in rows)
