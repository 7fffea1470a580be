"""streaming_curation_filter: stream == batch for the stateless
curation front (quality gate + Bloom decontamination + PII scrub).

Replay harness as in test_streaming.py: time-ordered parquet files +
maxFilesPerTrigger=1 + availableNow.  Everything in this operator is
stateless map-side work, so stream==batch must hold EXACTLY row by row
(no first-arrival ambiguity like the dedup filter)."""

import os
import random

import pandas as pd
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import build_bloom_bitmap
from pandas_sigproc_spark.operators import text as T
from pandas_sigproc_spark.streaming import streaming_curation_filter

SCHEMA = "doc_id long, text string"


def _mk_text(rng, n_words=60, n_stop=8):
    vocab = ["spark", "table", "scan", "merge", "row", "batch", "value", "hash"]
    ws = [rng.choice(vocab) for _ in range(n_words - n_stop)] + [
        "the",
        "a",
        "of",
        "and",
    ] * (n_stop // 4)
    rng.shuffle(ws)
    return " ".join(ws)


def _docs():
    rng = random.Random(11)
    texts = [_mk_text(rng) for _ in range(8)]
    texts.append("zz zz")  # low quality -> gated
    # contaminated doc: contains benchmark doc 0's first 5 words verbatim
    texts.append(" ".join(texts[0].split(" ")[:5]) + " " + _mk_text(rng))
    # PII-bearing doc
    texts.append("mail bob@example.com port 8080 " + _mk_text(rng, 56))
    return pd.DataFrame({"doc_id": list(range(11)), "text": texts})


def test_stream_equals_batch_with_bloom_and_scrub(spark, tmp_path):
    docs = _docs()
    bench = spark.createDataFrame(docs[docs.doc_id == 0], SCHEMA)
    gh = (
        bench.select(T.gram_hash_expr(5).alias("gs"))
        .select(F.explode("gs").alias("h"))
        .distinct()
    )
    bitmap = build_bloom_bitmap(gh)

    root = str(tmp_path / "cur_stream")
    os.makedirs(root)
    for i, part in enumerate((docs[docs.doc_id < 6], docs[docs.doc_id >= 6])):
        path = os.path.join(root, f"part-{i:03d}.parquet")
        part.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    out = streaming_curation_filter(stream, bloom_bitmap=bitmap)
    q = (
        out.writeStream.format("memory")
        .queryName("curation_filter")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from curation_filter")
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )

    batch_df = spark.createDataFrame(docs, SCHEMA)
    want = (
        streaming_curation_filter(batch_df, bloom_bitmap=bitmap)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)

    ids = set(got.doc_id)
    assert 8 not in ids  # quality-gated
    assert 0 not in ids and 9 not in ids  # benchmark text + contaminated doc
    assert 1 in ids and 2 in ids
    # PII doc survived, scrubbed, with masked chars counted
    row = got[got.doc_id == 10].iloc[0]
    assert "<EMAIL>" in row.text and "<NUM>" in row.text
    assert "bob@example.com" not in row.text
    assert row.masked_chars == len("bob@example.com") + len("8080")
    # clean docs untouched
    assert (got[got.doc_id != 10].masked_chars == 0).all()


def test_curation_filter_no_bloom_matches_classifier(spark):
    docs = spark.createDataFrame(_docs(), SCHEMA)
    out = streaming_curation_filter(docs, scrub=False).toPandas()
    from pandas_sigproc_spark.operators import quality_classifier

    ref = quality_classifier(docs).toPandas()
    kept = set(ref[ref.score >= 0.5].doc_id)
    assert set(out.doc_id) == kept
    merged = out.merge(ref[["doc_id", "score"]], on="doc_id", suffixes=("", "_ref"))
    assert (merged.score == merged.score_ref).all()
