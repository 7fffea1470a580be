"""The README's python snippets, EXECUTED (r8 verdict #8): every code
block under "Using the library" runs verbatim against fixture data —
only path string literals and one scale literal are substituted — so an
API promotion that drifts from the docs fails here, not in a user's
shell.  (This test already caught two real doc bugs on introduction:
``.df()`` calling the property's DataFrame, and a file-sink
writeStream without the required checkpointLocation.)"""

import os
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import make_signals

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")
SF_DIR = "/root/testdata/sf0.001"


def _python_blocks() -> list[str]:
    return re.findall(r"```python\n(.*?)```", open(README).read(), re.S)


def test_readme_has_the_three_usage_blocks():
    # sigproc chain / curation / streaming — if a block is added this
    # count forces the executor below to cover it too
    assert len(_python_blocks()) == 3


def test_readme_snippets_execute(spark, tmp_path):
    blocks = _python_blocks()

    # -- fixtures standing in for the reader's data --------------------
    t = np.arange(0, 2.0, 1 / 2000.0)
    rng = np.random.default_rng(5)
    sig = make_signals(
        spark, {f"c{i}": (t, rng.standard_normal(len(t))) for i in range(2)}
    )
    signals_path = str(tmp_path / "signals.parquet")
    sig.write.parquet(signals_path)
    docs_path = f"{SF_DIR}/documents.parquet"

    from pandas_sigproc_spark.operators import text as T

    docs_df = spark.read.parquet(docs_path)
    bench_gram_hashes = (
        docs_df.filter("doc_id % 10 = 0")
        .select(F.explode(T.gram_hash_expr(5)).alias("h"))
        .distinct()
    )
    new_batch = docs_df.filter("doc_id % 7 = 3").select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    embeds = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    sch = "doc_id long, text string"
    landing = str(tmp_path / "landing")
    new_batch.write.parquet(landing)
    from pandas_sigproc_spark.sources.bmp import encode_bmp

    r9 = np.random.default_rng(2)
    imgs = {
        i: encode_bmp(
            np.repeat(
                np.kron(
                    r9.integers(0, 256, (8, 8)), np.ones((8, 8))
                ).astype(np.uint8)[:, :, None],
                3,
                2,
            )
        )
        for i in range(6)
    }
    from pandas_sigproc_spark.sources.wav import encode_wav_bytes

    t9 = np.arange(0, 1.5, 1 / 8000.0)
    audio_clips = {
        i: np.sin(2 * np.pi * (300 + 70 * i) * t9) for i in range(4)
    }
    import pandas as _pd

    audio_media = spark.createDataFrame(
        _pd.DataFrame(
            {
                "media_id": list(audio_clips),
                "payload": [
                    encode_wav_bytes(8000, c) for c in audio_clips.values()
                ],
            }
        ),
        "media_id long, payload binary",
    )
    media = spark.createDataFrame(
        _pd.DataFrame(
            {"media_id": list(imgs), "payload": list(imgs.values())}
        ),
        "media_id long, payload binary",
    )

    from pandas_sigproc_spark.sources.pkzip import encode_zip
    from pandas_sigproc_spark.sources.tar import encode_tar
    from pandas_sigproc_spark.sources.warc import encode_warc

    zip_shards = spark.createDataFrame(
        _pd.DataFrame(
            {
                "shard_id": [0],
                "payload": [
                    encode_zip(
                        [{"name": "0.txt", "payload": b"zipped doc"}],
                        compress=True,
                    )
                ],
            }
        ),
        "shard_id long, payload binary",
    )
    shards = spark.createDataFrame(
        _pd.DataFrame(
            {
                "shard_id": [0],
                "payload": [
                    encode_tar(
                        [("0.bmp", list(imgs.values())[0]), ("0.cls", b"1")]
                    )
                ],
            }
        ),
        "shard_id long, payload binary",
    )
    archives = spark.createDataFrame(
        _pd.DataFrame(
            {
                "archive_id": [0],
                "payload": [
                    encode_warc(
                        [{"uri": "http://corpus/1", "payload": b"doc one"}],
                        gzip_records=True,
                    )
                ],
            }
        ),
        "archive_id long, payload binary",
    )

    # -- narrow, explicit substitutions: paths + one scale literal -----
    subs = {
        '"signals.parquet"': repr(signals_path),
        '"documents.parquet"': repr(docs_path),
        '"/warehouse/sigstore"': repr(str(tmp_path / "sigstore")),
        '"/warehouse/phashes"': repr(str(tmp_path / "phashes")),
        '"/warehouse/pqcodes"': repr(str(tmp_path / "pqcodes")),
        '"landing/"': repr(landing),
        '"dups/"': repr(str(tmp_path / "dups")),
        '"ckpt/"': repr(str(tmp_path / "ckpt")),
        "k=1024": "k=8",  # trained-quantizer sketch, shrunk to 500 rows
    }
    ns = {
        "bench_gram_hashes": bench_gram_hashes,
        "new_batch": new_batch,
        "embeds": embeds,
        "media": media,
        "new_media": media,
        "shards": shards,
        "zip_shards": zip_shards,
        "archives": archives,
        "audio_media": audio_media,
        "sch": sch,
    }
    for i, block in enumerate(blocks):
        src = block
        for lit, rep in subs.items():
            src = src.replace(lit, rep)
        exec(compile(src, f"README.md#python-block-{i}", "exec"), ns)

    # -- the documented results actually materialize -------------------
    assert ns["out"].limit(1).count() == 1
    assert {"channel_id", "freq", "power"} <= set(ns["psd"].columns)
    assert ns["groups"].count() >= 0  # may legitimately be empty
    assert len(ns["bitmap"]) == ns["m"] // 32
    v = ns["verdicts"]
    assert {"doc_id", "is_exact_dup", "kept"} <= set(v.columns)
    assert v.count() == new_batch.count()
    assert ns["topk"].filter("rank <= 3").count() > 0
    assert ns["topk_pq"].filter("rank <= 3").count() > 0
    assert {"v1", "v2", "cos"} <= set(ns["near"].columns)
    assert {"m1", "m2", "hamming"} <= set(ns["img_dups"].columns)
    iv = ns["img_verdicts"]
    assert {"media_id", "is_exact_dup", "kept"} <= set(iv.columns)
    # probing the corpus against its own store: every image is an
    # exact dup of itself
    assert iv.filter("NOT is_exact_dup").count() == 0
    assert ns["img_dups"].count() >= 0
    assert {"m1", "m2", "match_frac"} <= set(ns["aud_dups"].columns)
    assert ns["aud_dups"].count() >= 0
    zm = ns["zmembers"].collect()
    assert [(r.name, bytes(r.payload)) for r in zm] == [
        ("0.txt", b"zipped doc")
    ]

    # the streaming query: drain the one landing batch, then check the
    # sink received the dup-pair schema
    q = ns["q"]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink = spark.read.parquet(str(tmp_path / "dups"))
    assert {"d_id", "match_id", "src"} <= set(sink.columns)
