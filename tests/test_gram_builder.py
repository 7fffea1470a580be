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
