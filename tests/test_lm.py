"""ngram_lm_score (operators/lm.py): values against an independent
pure-Python add-alpha bigram LM, bucket modes, and edge cases."""

import math

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.lm import ngram_lm_score

REF_TEXTS = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
]
DOC_TEXTS = {
    1: "the cat sat on the mat",          # in-domain: low perplexity
    2: "the dog sat on the mat",
    3: "zebra quark flux boson entropy",  # all-unseen: high perplexity
    4: "a dog and a cat sat",
    5: "singleton",                       # one token: no transitions
    6: "on the rug",
}
ALPHA = 0.5


def _py_lm():
    uni: dict[str, int] = {}
    big: dict[tuple[str, str], int] = {}
    for t in REF_TEXTS:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    return uni, big, len(uni)


def _py_score(text: str) -> tuple[int, float] | None:
    uni, big, V = _py_lm()
    ws = text.split(" ")
    if len(ws) < 2:
        return None
    s = 0.0
    for a, b in zip(ws, ws[1:]):
        p = (big.get((a, b), 0) + ALPHA) / (uni.get(a, 0) + ALPHA * (V + 1))
        s += math.log10(p)
    n = len(ws) - 1
    return n, round(-s / n, 6)


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(DOC_TEXTS), "text": list(DOC_TEXTS.values())}
        )
    )
    ref = spark.createDataFrame(pd.DataFrame({"text": REF_TEXTS}))
    return docs, ref


def test_scores_match_reference_impl(frames):
    docs, ref = frames
    out = (
        ngram_lm_score(docs, ref, alpha=ALPHA)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    expect = {d: _py_score(t) for d, t in DOC_TEXTS.items()}
    assert 5 not in out.index  # single-token doc dropped
    for d, exp in expect.items():
        if exp is None:
            continue
        n, ppl = exp
        assert out.loc[d, "n_trans"] == n
        assert out.loc[d, "log10_ppl"] == pytest.approx(ppl, abs=1e-9)
    # ordering agrees with the reference impl end to end
    ranked = sorted(
        (v[1], d) for d, v in expect.items() if v is not None
    )
    assert out.log10_ppl.idxmax() == ranked[-1][1] == 3  # all-unseen worst
    assert out.log10_ppl.idxmin() == ranked[0][1]


def test_ntile_buckets(frames):
    docs, ref = frames
    out = (
        ngram_lm_score(docs, ref, alpha=ALPHA)
        .toPandas()
        .sort_values("log10_ppl", ignore_index=True)
    )
    # 5 scored docs -> ntile(3) = 2/2/1 in rank order
    assert list(out.bucket) == ["head", "head", "middle", "middle", "tail"]


def test_fixed_thresholds_map_side(frames):
    docs, ref = frames
    scored = ngram_lm_score(docs, ref, alpha=ALPHA).toPandas()
    t1 = scored.log10_ppl.min()
    t2 = scored.log10_ppl.median()
    out = (
        ngram_lm_score(docs, ref, alpha=ALPHA, thresholds=(t1, t2))
        .toPandas()
        .set_index("doc_id")
    )
    for d in out.index:
        ppl = out.loc[d, "log10_ppl"]
        want = "head" if ppl <= t1 else ("middle" if ppl <= t2 else "tail")
        assert out.loc[d, "bucket"] == want
    # fixed-threshold mode must not contain the ntile window
    plan = (
        ngram_lm_score(docs, ref, thresholds=(2.0, 3.0))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ntile" not in plan.lower()


def test_sampled_terciles_match_python_replay(spark, frames):
    # 40 docs with distinct scores; sample_mod=2 keeps ~half.  The
    # contract: cutoffs = numpy-linear (quantile_cont) 1/3 and 2/3
    # quantiles of the md5-sampled scores, rounded to 6 digits, applied
    # as <= CASE over ALL scored docs.
    import hashlib

    import numpy as np

    _, ref = frames
    texts = {i: f"the cat sat on the mat {'zebra ' * (i % 7)}x{i}" for i in range(40)}
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    out = (
        ngram_lm_score(docs, ref, alpha=ALPHA, thresholds="sampled", sample_mod=2)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    sampled = [
        out.loc[d, "log10_ppl"]
        for d in out.index
        if int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % 2 == 0
    ]
    t1 = round(float(np.quantile(sampled, 1.0 / 3, method="linear")), 6)
    t2 = round(float(np.quantile(sampled, 2.0 / 3, method="linear")), 6)
    for d in out.index:
        ppl = out.loc[d, "log10_ppl"]
        want = "head" if ppl <= t1 else ("middle" if ppl <= t2 else "tail")
        assert out.loc[d, "bucket"] == want, (d, ppl, t1, t2)


def test_sampled_terciles_plan_has_no_window(frames):
    # The r8 rewrite's whole point: the bootstrap must not funnel the
    # corpus through an unpartitioned window (the old NTILE plan).
    docs, ref = frames
    plan = (
        ngram_lm_score(docs, ref, thresholds="sampled")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # word-bounded: "percentile" CONTAINS "ntile" but is the bounded
    # aggregate the rewrite is for
    import re

    assert not re.search(r"\bntile\(", plan.lower())
    assert "Window" not in plan


def test_empty_sample_raises_not_all_tail(frames):
    # sample_mod larger than anything the md5 sampler can keep: the
    # cutoffs come back NULL, and pre-guard every document silently
    # bucketed 'tail' — the output alone could not reveal the
    # misconfiguration.  The guard must raise at the first bucketed row.
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs, ref = frames
    out = ngram_lm_score(
        docs, ref, thresholds="sampled", sample_mod=10_000_000
    )
    with pytest.raises(SparkRuntimeException, match="sample is EMPTY"):
        out.collect()


def test_validation(frames):
    docs, ref = frames
    with pytest.raises(ValueError):
        ngram_lm_score(docs, ref, alpha=0.0)
    with pytest.raises(ValueError):
        ngram_lm_score(docs, ref, thresholds=(3.0, 2.0))
    with pytest.raises(ValueError):
        ngram_lm_score(docs, ref, thresholds="bogus")
    with pytest.raises(ValueError):
        ngram_lm_score(docs, ref, thresholds="sampled", sample_mod=0)


def test_gate_corpus_rounding_margin():
    # The lm_ppl oracles compare ROUND(-SUM(log10 p)/n, 6) across two
    # engines whose summation orders differ; that is hash-stable iff
    # every gate-corpus score sits far from a 0.5e-6 rounding boundary
    # relative to the worst cross-engine divergence (~eps * |sum| *
    # sqrt(n) / n ~ 1e-15 here).  Re-measure per sf so a data refresh
    # that erodes the margin fails HERE, not at the driver gate.
    import os
    import duckdb
    import numpy as np
    from __spark_entry__ import _sql_lm_scored_cte, _LM_T1, _LM_T2

    raw_sql = (
        "WITH "
        + _sql_lm_scored_cte().replace(
            "ROUND(-SUM(l) / COUNT(*), 6)", "-SUM(l) / COUNT(*)"
        )
        + " SELECT log10_ppl FROM sc"
    )
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1"):
        if not os.path.isdir(sf):
            continue
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'"
        )
        x = con.sql(raw_sql).df().iloc[:, 0].to_numpy()
        frac = (x * 1e6) % 1.0
        margin = np.abs(frac - 0.5).min() * 1e-6
        assert margin > 3e-13, (sf, margin)
        # and the fixed bucket cutoffs must not bisect a rounded value
        r = np.round(x, 6)
        for t in (_LM_T1, _LM_T2):
            d = np.abs(r - t).min()
            assert d == 0.0 or d > 4.9e-7, (sf, t, d)


def test_lm_irregular_spacing_scores_like_clean_text(spark):
    # r13 review finding: split(' ') injected '' phantom tokens for
    # leading/trailing/double spaces, inflating perplexity for
    # cosmetically different but identical text.
    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(4)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, " the  cat sat ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_trans"], r["log10_ppl"])
           for r in ngram_lm_score(docs, ref).collect()}
    assert out[1] == out[2]


def test_lm_sampled_mode_salted_and_single_pass(spark):
    # salted sample (decorrelated from unsalted doc_id hashes) and the
    # persist hook: one clustering of the corpus feeds cuts AND output.
    ref = spark.createDataFrame(
        [(100, "a b c a b c a b")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(i, "a b c x y") for i in range(40)], "doc_id long, text string"
    )
    blocks = []

    def hook(d):
        blocks.append(d)
        return d.persist()

    out = ngram_lm_score(
        docs, ref, thresholds="sampled", sample_mod=2, persist=hook
    ).collect()
    assert len(out) == 40 and len(blocks) == 1
    for b in blocks:
        b.unpersist()
