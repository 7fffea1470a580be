"""gram_sql / grams_expr (operators/text.py): the linear zip-of-slices
n-gram builder must emit arrays bit-identical to the quadratic
transform+slice idiom it replaced, for every n/length combination, and
must stay linear on a giant document."""

import time

import pandas as pd
import pytest

from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.text import gram_sql, grams_expr

TEXTS = [
    "",
    "a",
    "a b",
    "a b c",
    "a b c d",
    "x y z w v u t s r q",
    "dup dup dup dup",
]


def _old_sql(n: int, text_col: str = "text") -> str:
    # the replaced idiom, kept here as the semantic reference
    return (
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
    )


def test_identical_to_replaced_idiom(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": TEXTS}))
    for n in (1, 2, 3, 5, 8):
        rows = df.select(
            F.expr(_old_sql(n)).alias("o"), grams_expr(n).alias("g")
        ).collect()
        for r in rows:
            assert r.o == r.g, (n, r.o, r.g)


def test_gram_count_formula(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": TEXTS}))
    rows = df.select(
        F.size(F.split("text", " ")).alias("L"),
        F.size(grams_expr(3)).alias("m"),
    ).collect()
    for r in rows:
        assert r.m == max(r.L - 2, 1)


def test_linear_on_giant_document(spark):
    # The replaced idiom measured 27 s on a 20k-token doc (re-splits the
    # document once per gram); the linear builder must do a 200k-token
    # doc comfortably inside the same budget.
    giant = spark.createDataFrame(
        pd.DataFrame({"text": [" ".join(f"u{i}" for i in range(200_000))]})
    )
    t0 = time.time()
    (n_grams,) = giant.select(F.size(grams_expr(3)).alias("s")).collect()[0]
    assert time.time() - t0 < 30
    assert n_grams == 200_000 - 2


def test_gram_hash_kernel_matches_expression(spark):
    """r15 optimization pin: text.gram_hashes_py / gram_hash_map (the
    Arrow kernel the decontamination tier now runs) must produce the
    EXACT hash arrays of gram_hash_expr — same grams, same 60-bit md5
    arithmetic, same first-occurrence distinct order, NULL text ->
    NULL array — on the edge battery and on real sf documents."""
    import duckdb

    from pandas_sigproc_spark.operators.text import (
        gram_hash_expr,
        gram_hash_map,
    )

    sf_texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " ORDER BY doc_id LIMIT 100"
        ).fetchall()
    ]
    texts = TEXTS + ["a  b   c", " lead", "trail ", "  ", None] + sf_texts
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(texts)), "text": texts})
    )
    for n in (1, 2, 5):
        want = {
            r.i: r.gs
            for r in df.select(
                "i", gram_hash_expr(n).alias("gs")
            ).collect()
        }
        got = {
            r.i: r.gs
            for r in gram_hash_map(
                df.select("i", "text"), n, "i long"
            ).collect()
        }
        assert got == want, n
