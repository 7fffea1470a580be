"""substring_dedup (word-level ExactSubstr) vs a pure-Python reference."""

import pytest

from pandas_sigproc_spark.operators import substring_dedup


def _ref(texts, n, min_count=2):
    """Independent reference: mark tokens covered by any n-gram whose
    global occurrence count is >= min_count."""
    from collections import Counter

    docs = {i: t.split(" ") for i, t in enumerate(texts)}
    counts = Counter(
        tuple(w[i : i + n])
        for w in docs.values()
        for i in range(len(w) - n + 1)
    )
    out = {}
    for d, w in docs.items():
        cov = set()
        for i in range(len(w) - n + 1):
            if counts[tuple(w[i : i + n])] >= min_count:
                cov.update(range(i, i + n))
        clean = " ".join(t for i, t in enumerate(w) if i not in cov)
        out[d] = (len(w), len(cov), clean)
    return out


TEXTS = [
    "a b c d e f g h i j",        # shares the 8-gram a..h with doc 1
    "x a b c d e f g h z",
    "p q r s t u v w",            # exactly 8 tokens, unique gram
    "short doc",                  # under n tokens -> no grams
    "r r r r r r r r r r r r",    # within-doc repetition of (r*8)
    "a b c d e f g h i j",        # exact duplicate of doc 0
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    pdf = substring_dedup(df, n=8).toPandas()
    return pdf.set_index("doc_id").sort_index()


def test_matches_reference(result):
    ref = _ref(TEXTS, 8)
    for d, (n_tok, n_dup, clean) in ref.items():
        row = result.loc[d]
        assert row["n_tokens"] == n_tok
        assert row["n_dup_tokens"] == n_dup
        assert row["clean_text"] == clean
        assert row["dup_frac"] == pytest.approx(
            round(n_dup / n_tok, 6), abs=0
        )


def test_exact_duplicate_fully_covered(result):
    # docs 0 and 5 are identical 10-token docs: every token sits inside
    # a duplicated 8-gram, so both clean to the empty string.
    for d in (0, 5):
        assert result.loc[d, "n_dup_tokens"] == 10
        assert result.loc[d, "clean_text"] == ""


def test_within_doc_repetition_counts(result):
    # doc 4 repeats 'r'*8 five times WITHIN one document — global count
    # >= 2 without any cross-document twin, so the whole doc is covered.
    assert result.loc[4, "n_dup_tokens"] == 12
    assert result.loc[4, "clean_text"] == ""


def test_short_and_unique_docs_untouched(result):
    assert result.loc[3, "n_dup_tokens"] == 0
    assert result.loc[3, "clean_text"] == TEXTS[3]
    assert result.loc[2, "n_dup_tokens"] == 0
    assert result.loc[2, "clean_text"] == TEXTS[2]


def test_min_count_threshold(spark):
    # With min_count=3 the pair shared twice (docs 0/1) stops matching,
    # but a gram occurring 3x still does.
    texts = ["a b c d e f g h", "a b c d e f g h", "a b c d e f g h"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pdf = substring_dedup(df, n=8, min_count=3).toPandas()
    assert (pdf["n_dup_tokens"] == 8).all()
    two = spark.createDataFrame(
        list(enumerate(texts[:2])), "doc_id long, text string"
    )
    pdf2 = substring_dedup(two, n=8, min_count=3).toPandas()
    assert (pdf2["n_dup_tokens"] == 0).all()


def test_validates_args(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        substring_dedup(df, n=1)
    with pytest.raises(ValueError):
        substring_dedup(df, min_count=1)


def test_random_corpora_match_reference(spark):
    # Seeded random corpora over a tiny vocabulary (dense n-gram
    # collisions) — the Spark plan must match the pure-Python reference
    # on every doc, for several n.
    import numpy as np

    for seed, n in [(0, 3), (1, 4), (2, 8)]:
        rng = np.random.default_rng(seed)
        texts = [
            " ".join(rng.choice(list("abcdef"), size=rng.integers(1, 40)))
            for _ in range(30)
        ]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        pdf = (
            substring_dedup(df, n=n)
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        ref = _ref(texts, n)
        for d, (n_tok, n_dup, clean) in ref.items():
            assert pdf.loc[d, "n_tokens"] == n_tok, (seed, n, d)
            assert pdf.loc[d, "n_dup_tokens"] == n_dup, (seed, n, d)
            assert pdf.loc[d, "clean_text"] == clean, (seed, n, d)


def test_partition_invariance(spark):
    # Global gram counts must not depend on input partitioning.
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    a = (
        substring_dedup(df.repartition(1), n=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        substring_dedup(df.repartition(7), n=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
