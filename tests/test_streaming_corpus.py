"""streaming_corpus_filter: stream == batch, cross-batch exact dedup.

Same replay harness as test_streaming.py: time-ordered parquet files +
maxFilesPerTrigger=1 + availableNow, so the dedup state provably carries
across micro-batches.
"""

import os
import random

import pandas as pd

from pandas_sigproc_spark.streaming import streaming_corpus_filter

SCHEMA = "doc_id long, text string"


def _mk_text(rng, n_words=80, n_stop=5):
    vocab = ["spark", "table", "scan", "merge", "row", "batch", "value", "hash"]
    ws = [rng.choice(vocab) for _ in range(n_words - n_stop)] + ["the", "a"] * (
        n_stop // 2
    ) + ["the"] * (n_stop % 2)
    rng.shuffle(ws)
    return " ".join(ws)


def _docs():
    rng = random.Random(5)
    texts = [_mk_text(rng) for _ in range(8)]
    texts.append("x y")  # low quality -> gated out
    texts.append(texts[2])  # exact duplicate of doc 2, arrives in batch 2
    return pd.DataFrame({"doc_id": list(range(10)), "text": texts})


def test_stream_equals_batch_and_dedup_carries(spark, tmp_path):
    docs = _docs()
    root = str(tmp_path / "docs_stream")
    os.makedirs(root)
    for i, part in enumerate((docs[docs.doc_id < 5], docs[docs.doc_id >= 5])):
        path = os.path.join(root, f"part-{i:03d}.parquet")
        part.to_parquet(path, index=False)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(root)
    )
    out = streaming_corpus_filter(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("corpus_filter")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from corpus_filter").toPandas()

    batch_df = spark.createDataFrame(docs, SCHEMA)
    # batch reference without dedup (batch dropDuplicates keeps an
    # arbitrary twin); the stream must keep the FIRST arrival, doc 2.
    want = streaming_corpus_filter(batch_df, dedup=False).toPandas()
    want = want[want.doc_id != 9]

    # low-quality doc gated, duplicate dropped, everything else kept
    assert 8 not in set(got.doc_id)
    assert 2 in set(got.doc_id) and 9 not in set(got.doc_id)
    g = got.sort_values("doc_id", ignore_index=True)
    w = want.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(g, w)
    # per-doc scores identical to the batch text operators
    assert set(g.columns) == {"doc_id", "text", "quality", "pred_lang", "n_tokens"}
    assert (g.quality >= 0.6).all() and (g.n_tokens > 0).all()
