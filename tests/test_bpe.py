"""BPE tokenizer (operators/bpe.py): the trained merge sequence equals
an INDEPENDENT pure-Python reference implementation (exact list
equality, including tie rounds) on real sf documents, the classic
Sennrich corpus anchor, and encode invariants."""

import collections

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.bpe import EOW, bpe_encode, bpe_train


# ---------------------------------------------------------------------------
# reference implementation (pure Python, no Spark) — Sennrich alg. 1
# ---------------------------------------------------------------------------


def _ref_train(texts, n_merges, min_pair_count=2):
    words = collections.Counter()
    for t in texts:
        for w in str(t).lower().split():
            words[w] += 1
    return _ref_train_words(words, n_merges, min_pair_count)


def _ref_train_words(words, n_merges, min_pair_count=2):
    vocab = {tuple(list(w) + [EOW]): n for w, n in words.items()}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for toks, n in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] += n
        if not pairs:
            break
        # max count, lexicographic tiebreak on (a, b) — the operator's rule
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = {}
        for toks, n in vocab.items():
            out, prev = [], None
            for x in toks:
                if prev == a and x == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = x
            if prev is not None:
                out.append(prev)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )


def test_sennrich_anchor(spark):
    """The classic corpus: 'low' x5, 'lower' x2, 'newest' x6,
    'widest' x3 — the first merges must assemble 'est</w>' (the
    highest-frequency pair chain: 9 occurrences)."""
    texts = (["low"] * 5) + (["lower"] * 2) + (["newest"] * 6) + (["widest"] * 3)
    merges = bpe_train(_docs_df(spark, [" ".join(texts)]), 4)
    assert merges == _ref_train([" ".join(texts)], 4)
    assert merges[0] == ("e", "s")  # 9 occurrences, beats everything
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    joined = {a + b for a, b in merges}
    assert "est" in joined and ("est" + EOW) in joined


def test_train_matches_reference_on_sf_docs(spark):
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    docs = _docs_df(spark, texts)
    got = bpe_train(docs, 30)
    want = _ref_train(texts, 30)
    assert got == want  # exact sequence, tie rounds included
    assert len(got) == 30


def test_encode_invariants(spark):
    texts = ["the quick brown fox", "the lazy dog", "the the the"]
    docs = _docs_df(spark, texts)
    merges = bpe_train(docs, 10, min_pair_count=1)
    out = (
        bpe_encode(docs, merges)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # decode identity: concatenating tokens and stripping EOW recovers
    # the lowercased text
    for i, text in enumerate(texts):
        joined = "".join(out.tokens[i]).replace(EOW, " ").strip()
        assert joined == " ".join(text.lower().split())
        assert out.n_tokens[i] == len(out.tokens[i])
    # tokens come from the trained vocabulary: every multi-char token
    # (minus EOW) is a merge product
    products = {a + b for a, b in merges}
    for toks in out.tokens:
        for t in toks:
            base = t[:-len(EOW)] if t.endswith(EOW) else t
            assert t in products or len(base) <= 1, t
    # more merges never increase the token count
    out0 = bpe_encode(docs, []).toPandas().sort_values("doc_id")
    assert (out.n_tokens.to_numpy() <= out0.n_tokens.to_numpy()).all()


def test_unicode_whitespace_parity(spark):
    """Train-time segmentation is Java regex \\s+ (ASCII); encode must
    match it exactly — an NBSP is NOT a separator on either side."""
    texts = ["foo\u00a0bar foo\u00a0bar baz baz baz"]
    docs = _docs_df(spark, texts)
    merges = bpe_train(docs, 8, min_pair_count=2)
    assert merges == _ref_train_ascii(texts, 8)
    out = bpe_encode(docs, merges).toPandas()
    joined = "".join(out.tokens[0]).replace(EOW, " ").strip()
    # the NBSP word survives as ONE word in both phases
    assert joined == "foo\u00a0bar foo\u00a0bar baz baz baz"


def _ref_train_ascii(texts, n_merges):
    import re

    words = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", str(t).lower(), flags=re.ASCII):
            if w:
                words[w] += 1
    # the reference merge machinery on ASCII-split words (plain
    # str.split would re-segment the NBSP word this test plants)
    return _ref_train_words(words, n_merges)


def test_validation(spark):
    docs = _docs_df(spark, ["a b"])
    with pytest.raises(ValueError):
        bpe_train(docs, 0)
    # early stop: nothing repeats, min_pair_count=2 finds no merge
    assert bpe_train(docs, 5) == []
