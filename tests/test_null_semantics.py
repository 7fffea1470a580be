"""r13 curation/text review pass: NULL/NaN edge semantics.  The sf
corpora carry no NULL text/lang, so these pin the conventions the tier
documents (null-as-empty, every-doc-gets-a-verdict) on hand fixtures.
"""

import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import curation as cur
from pandas_sigproc_spark.operators import text as t


def test_incremental_dedup_matches_null_text_across_sides(spark):
    # NULL-text corpus doc vs empty-string delta doc: the null-as-empty
    # rule makes them exact duplicates on every path (store/streaming
    # twins already did; the inline batch path silently disagreed).
    corpus = spark.createDataFrame(
        [(1, None), (2, "alpha beta gamma delta")], "doc_id long, text string"
    )
    delta = spark.createDataFrame(
        [(10, ""), (11, "fresh text never seen")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["is_exact_dup"]
        for r in cur.incremental_dedup(corpus, delta).collect()
    }
    assert out[10] is True   # '' == coalesced NULL corpus doc
    assert out[11] is False


def test_temperature_sample_keeps_null_lang_class(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else None) for i in range(200)],
        "doc_id long, lang string",
    )
    got = cur.temperature_sample(docs)
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    # NULL-lang docs are their own sampled class, not silently dropped
    assert None in langs and "en" in langs


def test_cluster_representatives_nan_score_never_wins(spark):
    comp = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "id long, component long"
    )
    scores = spark.createDataFrame(
        [(1, float("nan")), (2, 0.9), (3, 0.1)], "doc_id long, score double"
    )
    out = cur.cluster_representatives(
        comp.select(F.col("id").alias("doc_id"), "component"), scores
    )
    reps = {r["rep_doc_id"] for r in out.collect()}
    assert reps == {2}  # the real 0.9, not the NaN


def test_bloom_probe_refuses_mismatched_bitmap(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="different m"):
        cur.bloom_probe(docs, [0] * 100, m_bits=2**20)


def test_decontaminate_exact_null_pred_is_probed(spark):
    # A NULL predicate row must land on the TRAIN side and be probed.
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5 w6", "test"),
            (2, "w1 w2 w3 w4 w5 x y", None),  # shares the 5-gram, NULL split
            (3, "zz yy xx ww vv uu", "train"),
        ],
        "doc_id long, text string, split string",
    )
    out = cur.decontaminate_exact(
        docs, bench_pred=F.col("split") == "test", n=5
    )
    flagged = {r["doc_id"] for r in out.collect()}
    assert 2 in flagged  # previously invisible to both sides


def test_chunk_documents_null_text_chunks_like_empty(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = t.chunk_documents(docs, 4).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == {1, 2}  # both emit exactly one chunk
    assert by_id[1]["chunk_text"] == by_id[2]["chunk_text"] == ""


def test_normalize_trim_parity_on_final_line_separators(spark):
    import duckdb

    # U+2028 (LINE SEPARATOR) survives normalization; Java's $ would
    # trim the space before it while RE2's $ would not — \z agrees.
    s = "abc  "
    assert s.endswith("\u2028") and s[-2] == " "  # fixture is real
    got_spark = (
        spark.createDataFrame([(s,)], "text string")
        .select(t.normalize_text_expr("text").alias("n"))
        .first()["n"]
    )
    got_duck = duckdb.sql(
        "SELECT " + t.normalize_duckdb_sql("t.text") + " AS n FROM (SELECT ? AS text) t",
        params=[s],
    ).fetchone()[0]
    assert got_spark == got_duck
