"""Document-frequency skew guard on the Jaccard tier.

Properties pinned here:
1. max_df above every shingle's df  => results bit-identical to uncapped.
2. max_df below the boilerplate df  => results equal a pure-Python golden
   computing Jaccard over the df-FILTERED shingle sets (the cap drops hot
   shingles consistently from join, intersections, and sizes).
3. The pairs plan and the PPJoin plan agree under every cap.

The corpus is the adversarial case the cap exists for: 50% of docs share
one large boilerplate block, so uncapped shingle df is ~half the corpus
and the pair aggregation would grow quadratically at scale.
"""

import itertools

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.dedup import jaccard_pairs, jaccard_ppjoin

BOILER = "all rights reserved this page is served by example corp navigation home about contact terms of service privacy policy"

T = 0.5
NGRAM = 3


def _corpus():
    rows = []
    for i in range(40):
        body = " ".join(f"w{i}x{j}" for j in range(30))
        if i % 2 == 0:
            body = BOILER + " " + body
        rows.append((i, body))
    # two genuine near-dup pairs: one boilerplated, one clean
    rows.append((100, BOILER + " " + " ".join(f"w0x{j}" for j in range(28))))
    rows.append((101, " ".join(f"w1x{j}" for j in range(29))))
    return rows


def _shingles(text):
    w = text.split(" ")
    n = max(len(w) - (NGRAM - 1), 1)
    return {" ".join(w[i : i + NGRAM]) for i in range(n)}


def _golden(rows, max_df):
    sets = {i: _shingles(t) for i, t in rows}
    if max_df is not None:
        df = {}
        for s in sets.values():
            for sh in s:
                df[sh] = df.get(sh, 0) + 1
        sets = {i: {sh for sh in s if df[sh] <= max_df} for i, s in sets.items()}
    out = []
    for (i, si), (j, sj) in itertools.combinations(sorted(sets.items()), 2):
        inter = len(si & sj)
        union = len(si | sj)
        if union and inter / union >= T:
            out.append((i, j, round(inter / union, 6)))
    return sorted(out)


@pytest.fixture(scope="module")
def docs(spark):
    pdf = pd.DataFrame(_corpus(), columns=["doc_id", "text"])
    return spark.createDataFrame(pdf)


def _run(fn, docs, max_df):
    pdf = fn(docs, T, max_df=max_df).toPandas()
    return sorted(
        (int(r.d1), int(r.d2), round(float(r.jaccard), 6)) for r in pdf.itertuples()
    )


@pytest.mark.parametrize("max_df", [None, 1000, 5])
def test_pairs_matches_golden(docs, max_df):
    assert _run(jaccard_pairs, docs, max_df) == _golden(_corpus(), max_df)


@pytest.mark.parametrize("max_df", [None, 1000, 5])
def test_ppjoin_matches_golden(docs, max_df):
    assert _run(jaccard_ppjoin, docs, max_df) == _golden(_corpus(), max_df)


def test_cap_above_max_df_is_identity(docs):
    assert _run(jaccard_pairs, docs, 1000) == _run(jaccard_pairs, docs, None)


def test_boilerplate_pair_found_with_cap(docs):
    # The (0, 100) near-dup must survive the cap: their similarity comes
    # from real content, not the boilerplate.
    got = _run(jaccard_ppjoin, docs, 5)
    assert any(p[:2] == (0, 100) for p in got)
    assert any(p[:2] == (1, 101) for p in got)


def test_threshold_boundary_pair_not_lost(spark):
    # J exactly AT a threshold that is not representable in binary
    # (0.55): 100-word doc A, 55-word subset doc B, word shingles (n=1).
    # 100 * 0.55 evaluates to 55.000...01 in float64, so an unguarded
    # size bound (and the PPJoin prefix length) silently dropped the
    # pair; the relaxed pruning threshold must keep it while the exact
    # final filter still decides membership.
    words = [f"u{i}" for i in range(100)]
    docs_pdf = pd.DataFrame(
        {"doc_id": [0, 1], "text": [" ".join(words), " ".join(words[:55])]}
    )
    docs = spark.createDataFrame(docs_pdf, "doc_id long, text string")
    for fn in (jaccard_pairs, jaccard_ppjoin):
        out = fn(docs, threshold=0.55, n=1).toPandas()
        assert len(out) == 1, fn.__name__
        assert abs(out.iloc[0]["jaccard"] - 0.55) < 1e-9
