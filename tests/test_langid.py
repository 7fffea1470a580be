"""Model-based language ID (operators/langid.py): the fastText-style
hashed-trigram linear classifier."""

import hashlib

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.langid import (
    LANG_MODEL_BUCKETS,
    LANG_MODEL_NGRAMS,
    MODEL_LANGS,
    lang_id_model,
    lang_model_rows,
)

SENTENCES = {
    "en": "The quick brown fox jumps over the lazy dog and the things "
          "are going fine together with everything else",
    "de": "Der schnelle braune Fuchs springt und die Dinge sind ein "
          "wenig schwierig aber die Entscheidung ist richtig",
    "es": "El rapido zorro marron salta sobre el perro perezoso y las "
          "cosas que pasan son de los que vienen",
    "fr": "Le renard brun rapide saute par dessus le chien paresseux "
          "et les choses qui sont la ne sont que des questions",
}


def _df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )


def test_four_language_accuracy(spark):
    langs = list(SENTENCES)
    out = {
        r.doc_id: r
        for r in lang_id_model(_df(spark, [SENTENCES[l] for l in langs]))
        .collect()
    }
    for i, lang in enumerate(langs):
        assert out[i].pred_lang == lang, (lang, out[i])
        # the winning score is the max reported score
        scores = {l: getattr(out[i], f"score_{l}") for l in MODEL_LANGS}
        assert scores[lang] == max(scores.values())


def test_und_on_code_and_empty(spark):
    out = {
        r.doc_id: r
        for r in lang_id_model(
            _df(spark, ["x = f(y); return z;", "", "12345 67890"])
        ).collect()
    }
    for i in range(3):
        assert out[i].pred_lang == "und"
        assert out[i].n_hits == 0


def test_short_document_beats_heuristic(spark):
    # A short fragment with no stopwords from the probe sets: the
    # heuristic says 'und', the trigram model still reads the English
    # character statistics ("ing", " th", "er ").
    out = lang_id_model(_df(spark, ["thinking together"])).collect()[0]
    assert out.pred_heur == "und"
    assert out.pred_lang == "en"
    assert out.agree is False


def test_agree_column_is_consistent(spark):
    rows = lang_id_model(
        _df(spark, list(SENTENCES.values()) + ["return x", ""])
    ).collect()
    for r in rows:
        assert r.agree == (r.pred_lang == r.pred_heur)


def test_weight_table_invariants():
    rows = lang_model_rows()
    buckets = [r[0] for r in rows]
    assert buckets == sorted(buckets)
    assert len(set(buckets)) == len(buckets)  # merged, not duplicated
    assert all(0 <= b < LANG_MODEL_BUCKETS for b in buckets)
    # every lexicon gram's bucket is present, weights all positive ints
    for lang_idx, lang in enumerate(MODEL_LANGS):
        for g in LANG_MODEL_NGRAMS[lang]:
            b = (
                int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                % LANG_MODEL_BUCKETS
            )
            row = next(r for r in rows if r[0] == b)
            assert row[1 + lang_idx] > 0
    for r in rows:
        assert all(isinstance(w, int) and w >= 0 for w in r[1:])


def test_collision_merge_semantics(monkeypatch):
    # Two lexicon grams forced into one bucket must MERGE by summation
    # (the fastText hashing-trick semantics), not duplicate the row.
    import pandas_sigproc_spark.operators.langid as L

    monkeypatch.setattr(L, "LANG_MODEL_BUCKETS", 1)  # everything collides
    rows = L.lang_model_rows()
    assert len(rows) == 1
    b, *w = rows[0]
    assert b == 0
    for lang_idx, lang in enumerate(MODEL_LANGS):
        want = sum(
            L._milliweight(i) for i in range(len(LANG_MODEL_NGRAMS[lang]))
        )
        assert w[lang_idx] == want


def test_deterministic_across_runs(spark):
    df = _df(spark, list(SENTENCES.values()))
    a = sorted(map(tuple, lang_id_model(df).collect()))
    b = sorted(map(tuple, lang_id_model(df).collect()))
    assert a == b


def test_kernel_matches_expression_path(spark):
    """r15 optimization pin: the Arrow per-document kernel
    (impl='kernel', the default) must be row-for-row identical to the
    original relational explode/join/groupBy plan (impl='expr') on the
    edge battery — empty/NULL/sub-trigram docs, unicode that the
    normalizer strips, cross-language stopword ties, and a doc with no
    lexicon gram at all."""
    texts = [
        "the quick brown fox and the lazy dog of doom is here",
        "der die und ist das ein ich schöne",
        "el que la y es cosa que entiende la nacion",
        "le la et est une chose que personne eur ais",
        "", None, "a", "zz",
        "中文文本 de shi zai he",
        "x" * 2000,
        "the der el le de",
        "1234 !@#$ %^&*",
        "  leading and trailing  ",
        "Über straße İstanbul çok güzel",
    ]
    df = _df(spark, texts)
    kern = lang_id_model(df, impl="kernel").orderBy("doc_id").collect()
    expr = lang_id_model(df, impl="expr").orderBy("doc_id").collect()
    assert kern == expr


def test_kernel_plan_has_no_explode_or_shuffle(spark):
    """The kernel path is one map-side Arrow stage: no Generate
    (explode), no per-gram aggregate Exchange in the physical plan."""
    df = _df(spark, ["the and of a is"])
    plan = (
        lang_id_model(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan
    assert "Exchange" not in plan
