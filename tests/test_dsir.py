"""DSIR importance-resampling selection (operators/dsir.py — Xie et
al. 2023): weights vs an independent pure-Python reference, target
affinity, Gumbel-top-k determinism, and the guard matrix."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_NUDGE,
    dsir_select,
    dsir_weights,
)

DOCS = [
    # target-like documents: English-prose-ish token distribution
    (0, "the cat sat on the mat and the dog sat too", "en"),
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "a cat and a dog and a fox sat on the mat", "en"),
    # off-target: disjoint vocabulary
    (3, "zzq xxv qqw vvk zzq kkp xxv zzq qqw vvk", "zz"),
    (4, "kkp vvk zzq qqw xxv kkp zzq vvk qqw kkp", "zz"),
    (5, "mno pqr stu mno pqr stu mno pqr stu mno", "zz"),
]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_weights(docs, buckets=DSIR_BUCKETS, alpha=1.0):
    """Independent reference: plain dict arithmetic, no Spark/SQL."""
    n_t, n_r = {}, {}
    toks = {}
    for did, text, lang in docs:
        ws = (text or "").split(" ")
        bs = [_h60(w) % buckets for w in ws]
        toks[did] = bs
        for b in bs:
            n_r[b] = n_r.get(b, 0) + 1
            if lang == "en":
                n_t[b] = n_t.get(b, 0) + 1
    NT, NR = sum(n_t.values()), sum(n_r.values())
    out = {}
    for did, bs in toks.items():
        w = sum(
            math.log((n_t.get(b, 0) + alpha) / (NT + alpha * buckets))
            - math.log((n_r.get(b, 0) + alpha) / (NR + alpha * buckets))
            for b in bs
        )
        out[did] = round(w + DSIR_NUDGE, 6)
    return out


def test_weights_match_pure_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: (r["weight"], r["n_tokens"])
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    want = _ref_weights(DOCS)
    assert set(got) == set(want)
    for did, w in want.items():
        assert got[did][0] == pytest.approx(w, abs=2e-6), did
        assert got[did][1] == len(DOCS[did][1].split(" "))


def test_target_documents_outweigh_off_target(spark):
    # the point of DSIR: target-distribution docs score higher
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    w = {
        r["doc_id"]: r["weight"]
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    }
    assert min(w[0], w[1], w[2]) > max(w[3], w[4], w[5])


def test_select_is_deterministic_topk(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    a = dsir_select(df, F.col("lang") == "en", 3).collect()
    b = dsir_select(df, F.col("lang") == "en", 3).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    assert len(a) == 3
    # keys descend; schema carries the audit columns
    keys = [r["gkey"] for r in a]
    assert keys == sorted(keys, reverse=True)
    assert set(a[0].asDict()) == {"doc_id", "weight", "n_tokens", "gkey"}


def test_null_text_and_null_predicate_survive(spark):
    rows = DOCS + [(6, None, "en"), (7, "some words here", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = dsir_weights(df, F.col("lang") == "en").collect()
    assert len(got) == len(rows)  # NULL text scores as the empty token
    sel = dsir_select(df, F.col("lang") == "en", len(rows)).collect()
    assert len(sel) == len(rows)


def test_guard_matrix(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    pred = F.col("lang") == "en"
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(df, pred, buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_weights(df, pred, alpha=0.0)
    with pytest.raises(ValueError, match="k >= 1"):
        dsir_select(df, pred, 0)
    with pytest.raises(ValueError, match="temperature"):
        dsir_select(df, pred, 1, temperature=0.0)


def test_plan_shape(spark):
    # scale contract: the log-ratio table broadcasts; no cartesian over
    # corpus rows (the only crossJoin is the 1-row totals broadcast);
    # selection is a global top-k, not a full sort.
    df = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    plan = dsir_select(df, F.col("lang") == "en", 3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan
