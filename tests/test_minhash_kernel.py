"""minhash_sig_map / minhash_sig_py pinned bit-identical to
minhash_sig_expr (the r15 Arrow-kernel swap of the signature fold —
operators/curation.py).  The kernel hashes the DISTINCT gram set while
the expression folds the (possibly duplicated) gram walk; MIN is
duplicate- and order-insensitive, so the signatures must be equal
element for element."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pandas_sigproc_spark.operators import curation as cur

SF = "/root/testdata/sf0.001"

EDGE_TEXTS = [
    None,
    "",
    " ",
    "one",
    "one two",
    "one two three",
    "one two three four five six",
    "dup dup dup dup dup",
    "a  b   c",  # interior empty tokens
    "trailing space ",
    "unicodé tøkens 中文 here",
    "x " * 500,  # long with heavy duplication
]

ALT_PERMS = tuple((a, b) for a, b in [(1299721, 104729), (15485863, 32452843), (49979687, 67867967), (86028121, 23)])


@pytest.mark.parametrize("n", [2, 3, 5])
def test_kernel_matches_expression_on_edges(spark, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    exp = df.select(
        "doc_id", cur.minhash_sig_expr("text", n).alias("sig")
    ).collect()
    ker = cur.minhash_sig_map(
        df.select("doc_id", "text"), "doc_id long", n=n
    ).collect()
    e = {r.doc_id: r.sig for r in exp}
    k = {r.doc_id: r.sig for r in ker}
    assert e == k


def test_kernel_matches_expression_on_real_docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    exp = df.select(
        "doc_id", cur.minhash_sig_expr("text", 3).alias("sig")
    ).collect()
    ker = cur.minhash_sig_map(
        df.select("doc_id", "text"), "doc_id long", n=3
    ).collect()
    assert {r.doc_id: r.sig for r in exp} == {r.doc_id: r.sig for r in ker}


def test_kernel_matches_expression_alt_perms(spark):
    # The batch dedup_minhash family's 4-permutation constants ride the
    # same kernel; pin that parametrization too.
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    exp = df.select(
        "doc_id",
        cur.minhash_sig_expr("text", 3, perms=ALT_PERMS).alias("sig"),
    ).collect()
    ker = cur.minhash_sig_map(
        df.select("doc_id", "text"), "doc_id long", n=3, perms=ALT_PERMS
    ).collect()
    assert {r.doc_id: r.sig for r in exp} == {r.doc_id: r.sig for r in ker}


def test_source_overlap_group_min_identity(spark):
    # source_overlap now takes per-source mins over per-DOC kernel
    # signatures; pin against the old explode-per-gram aggregation form.
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "source", "text"
    )
    p, perms = cur.INCR_MINHASH_P, cur.INCR_MINHASH_PERMS
    from pandas_sigproc_spark.operators import text as _text

    h = (
        F.expr("cast(conv(substring(md5(_sh), 1, 15), 16, 10) as bigint)")
        % F.lit(p)
    )
    hs = df.select(
        F.col("source").alias("grp"),
        F.explode(_text.grams_expr(3, "text")).alias("_sh"),
    ).select("grp", h.alias("h"))
    old = hs.groupBy("grp").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(p)).alias(f"m{i}")
            for i, (a, b) in enumerate(perms)
        ]
    ).collect()
    new = cur.minhash_sig_map(
        df.select(F.col("source").alias("grp"), "text"), "grp string"
    ).filter(F.col("sig").isNotNull()).groupBy("grp").agg(
        *[F.min(F.col("sig")[i]).alias(f"m{i}") for i in range(len(perms))]
    ).collect()
    o = {r.grp: [r[f"m{i}"] for i in range(len(perms))] for r in old}
    nw = {r.grp: [r[f"m{i}"] for i in range(len(perms))] for r in new}
    assert o == nw
