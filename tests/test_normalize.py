"""Text normalization (operators/text.py NORMALIZE_STEPS chain).

The chain must behave identically in Spark (Java regex) and DuckDB
(RE2) — the generated oracle mirror is only trustworthy if the two
automata agree on every step, so the core test here runs BOTH engines
over the same adversarial strings and compares outputs exactly (the
webcrawl html_text RE2==Java replay pattern).
"""

import duckdb
import pandas as pd

from pandas_sigproc_spark.operators.text import (
    NORMALIZE_STEPS,
    normalize_duckdb_sql,
    normalize_text,
    normalize_text_expr,
)

CASES = [
    # (raw, expected)
    ("plain text stays", "plain text stays"),
    ("a\r\nb\rc", "a\nb\nc"),
    ("zero\u200bwidth\u200c\nx\ufeffgone", "zerowidth\nxgone"),
    ("nbsp\u00a0and\u2003em\u3000ideographic", "nbsp and em ideographic"),
    ("ctrl\u0001\u0007here", "ctrlhere"),
    ("\u2018single\u2019 \u201cdouble\u201d", "'single' \"double\""),
    ("en\u2013dash em\u2014dash minus\u2212sign", "en-dash em-dash minus-sign"),
    ("dot dot dot\u2026", "dot dot dot..."),
    ("collapse    many\t\ttabs", "collapse many tabs"),
    ("  trim me  ", "trim me"),
    ("spaces \n around \n newlines", "spaces\naround\nnewlines"),
    ("", ""),
    ("  ", ""),  # only-junk input -> empty
    ("mixed \u2018q\u2019\u2026  end\r\n", "mixed 'q'... end"),
]


def test_chain_python_reference():
    # Pure-Python re replay of the steps (Python re is a third automaton
    # family; agreement adds confidence the patterns are in the common
    # subset).
    import re

    for raw, want in CASES:
        out = raw
        for pat, repl in NORMALIZE_STEPS:
            # Python re spells absolute-end \Z where Java/RE2 spell \z
            out = re.sub(pat.replace("\\z", "\\Z"), repl, out)
        assert out == want, f"python re: {raw!r} -> {out!r}, want {want!r}"


def test_spark_matches_expected(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(CASES)), "text": [c[0] for c in CASES]})
    )
    got = {
        r["doc_id"]: r["norm"]
        for r in df.select(
            "doc_id", normalize_text_expr("text").alias("norm")
        ).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"spark: {raw!r} -> {got[i]!r}, want {want!r}"


def test_duckdb_mirror_matches_expected():
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame({"doc_id": range(len(CASES)), "text": [c[0] for c in CASES]}),
    )
    sql = f"SELECT doc_id, {normalize_duckdb_sql('text')} AS norm FROM t"
    got = dict(con.sql(sql).fetchall())
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"duckdb: {raw!r} -> {got[i]!r}, want {want!r}"


def test_normalize_text_report(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["ok already", "  messy one "]}
        )
    )
    rows = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert rows[0]["changed"] is False
    assert rows[0]["norm_text"] == "ok already"
    assert rows[1]["changed"] is True
    assert rows[1]["norm_text"] == "messy one"
    assert rows[1]["n_chars_raw"] == len("  messy one ")
    assert rows[1]["n_chars_norm"] == len("messy one")


def test_idempotent():
    # normalize(normalize(x)) == normalize(x) — the chain is a fixpoint
    # on its own output (required for safe re-runs over partially
    # processed corpora).
    import re

    for raw, want in CASES:
        out = want
        for pat, repl in NORMALIZE_STEPS:
            out = re.sub(pat.replace("\\z", "\\Z"), repl, out)
        assert out == want


def test_normalize_is_stream_safe(spark, tmp_path):
    """normalize_text is a stateless expression tree, so it runs
    unchanged on a document stream — replayed-stream output == batch
    (the crawl-tier stream-safety contract)."""
    import os

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["  messy one ", "clean", "a\r\nb"],
        }
    )
    schema = "doc_id long, text string"
    batch = (
        normalize_text(spark.createDataFrame(pdf, schema))
        .toPandas()
        .sort_values(["doc_id"], ignore_index=True)
    )
    root = str(tmp_path / "norm_stream")
    os.makedirs(root, exist_ok=True)
    pdf.to_parquet(os.path.join(root, "part-000.parquet"), index=False)
    q = (
        normalize_text(spark.readStream.schema(schema).parquet(root))
        .writeStream.format("memory")
        .queryName("norm_stream_q")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from norm_stream_q")
        .toPandas()
        .sort_values(["doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[batch.columns], batch)
