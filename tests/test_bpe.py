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


def test_relational_encode_equals_python_encode(spark):
    """bpe_encode_relational (the train-side rewrite fold applied in
    rank order — the bpe_pack gate's engine) must produce EXACTLY the
    greedy bpe_encode tokenization, corpus-wide."""
    import duckdb

    from pandas_sigproc_spark.operators.bpe import bpe_encode_relational

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " ORDER BY doc_id"
        ).fetchall()
    ]
    docs = _docs_df(spark, texts)
    merges = bpe_train(docs, 12)
    a = {
        r.doc_id: (r.n_tokens, tuple(r.tokens))
        for r in bpe_encode(docs, merges).collect()
    }
    b = {
        r.doc_id: (r.n_tokens, tuple(r.tokens))
        for r in bpe_encode_relational(docs, merges).collect()
    }
    assert a == b


def test_relational_encode_self_merge_runs(spark):
    # a == b merges are where sequential-vs-greedy equality is
    # subtlest: runs pair left-to-right non-overlapping
    from pandas_sigproc_spark.operators.bpe import bpe_encode_relational

    docs = _docs_df(spark, ["aaa aaaa aaaaa a"])
    merges = [("a", "a"), ("aa", "aa")]
    got = {
        r.doc_id: tuple(r.tokens)
        for r in bpe_encode_relational(docs, merges).collect()
    }
    want = {
        r.doc_id: tuple(r.tokens)
        for r in bpe_encode(docs, merges).collect()
    }
    assert got == want
    # aaa -> [aa, a]; aaaa -> [aa, aa] -> [aaaa]; aaaaa -> [aaaa, a]
    assert got[0] == (
        "aa", "a", EOW, "aaaa", EOW, "aaaa", "a", EOW, "a", EOW
    )


def test_relational_encode_refuses_big_vocab(spark):
    from pandas_sigproc_spark.operators.bpe import bpe_encode_relational

    docs = _docs_df(spark, ["x"])
    with pytest.raises(ValueError, match="bpe_encode"):
        bpe_encode_relational(docs, [("a", str(i)) for i in range(65)])


def test_bpe_pack_composition_matches_reference(spark):
    """bpe_encode -> assign_shards -> pack_sequences as one plan,
    checked against a pure-Python replay of all three stages."""
    import hashlib

    import duckdb

    from pandas_sigproc_spark.operators.bpe import bpe_encode_relational
    from pandas_sigproc_spark.operators.packing import (
        assign_shards,
        pack_sequences,
    )

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " ORDER BY doc_id LIMIT 120"
        ).fetchall()
    ]
    docs = _docs_df(spark, texts)
    merges = bpe_train(docs, 8)
    shard_tokens, budget, buckets = 4096, 512, 16

    enc = bpe_encode_relational(docs, merges)
    sharded = assign_shards(
        enc.select("doc_id", "n_tokens"), shard_tokens, buckets=buckets
    )
    packed = pack_sequences(
        sharded,
        budget,
        tokens_col="n_tokens",
        order_col="global_start",
        group_cols=("shard",),
    )
    got = {
        r.global_start: (r.shard, r.n_tokens, r.pack_id, r.pack_pos)
        for r in packed.collect()
    }

    # pure-Python replay: greedy encode per word, md5-bucket layout,
    # integer prefix sum, greedy packing
    ranks = {m: i for i, m in enumerate(merges)}

    def enc_word(w):
        toks = list(w) + [EOW]
        while len(toks) >= 2:
            best = min(
                (
                    (ranks[(toks[i], toks[i + 1])], i)
                    for i in range(len(toks) - 1)
                    if (toks[i], toks[i + 1]) in ranks
                ),
                default=None,
            )
            if best is None:
                break
            i = best[1]
            toks[i : i + 2] = [toks[i] + toks[i + 1]]
        return toks

    import re

    counts = {}
    for did, t in enumerate(texts):
        n = sum(
            len(enc_word(w))
            for w in re.split(r"\s+", t.lower(), flags=re.ASCII)
            if w
        )
        if n > 0:
            counts[did] = n
    order = sorted(
        counts,
        key=lambda d: (
            int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % buckets,
            d,
        ),
    )
    want, gs = {}, 0
    state = {}  # shard -> (pack, pos, run)
    for d in order:
        n = counts[d]
        shard = gs // shard_tokens
        pack, pos, run = state.get(shard, (0, 0, 0))
        if pos > 0 and run + n > budget:
            pack, pos, run = pack + 1, 0, 0
        want[gs] = (shard, n, pack, pos)
        state[shard] = (pack, pos + 1, run + n)
        gs += n
    assert got == want


def test_token_counts_equal_encode_sizes(spark):
    """bpe_token_counts (the distinct-word scale path) must agree with
    bpe_encode's per-document token totals exactly — and drop docs
    with no words."""
    import duckdb

    from pandas_sigproc_spark.operators.bpe import bpe_token_counts

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " ORDER BY doc_id LIMIT 200"
        ).fetchall()
    ] + ["   ", ""]
    docs = _docs_df(spark, texts)
    merges = bpe_train(docs, 10)
    want = {
        r.doc_id: r.n_tokens
        for r in bpe_encode(docs, merges).collect()
        if r.n_tokens > 0
    }
    got = {
        r.doc_id: r.n_tokens
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert got == want
    assert len(texts) - 2 not in got  # "   " has no words
    assert len(texts) - 1 not in got  # "" has no words


def test_null_text_tokenizes_empty_in_all_three_paths(spark):
    # NULL text must be 0 tokens everywhere — size(NULL array) is -1
    # and str(None) is 'none', both wrong (review finding).
    import pandas as pd

    from pandas_sigproc_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_relational,
        bpe_token_counts,
    )

    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["a b", None]})
    docs = spark.createDataFrame(pdf, "doc_id long, text string")
    merges = [("a", "</w>")]
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
    rel = {r["doc_id"]: r for r in bpe_encode_relational(docs, merges).collect()}
    assert enc[1]["n_tokens"] == 0 and list(enc[1]["tokens"]) == []
    assert rel[1]["n_tokens"] == 0 and list(rel[1]["tokens"]) == []
    assert enc[0]["tokens"] == rel[0]["tokens"]
    cnt = {r["doc_id"]: r["n_tokens"] for r in bpe_token_counts(docs, merges).collect()}
    assert 1 not in cnt  # no-words doc yields NO row (documented)
    assert cnt[0] == enc[0]["n_tokens"]


def test_bpe_encode_null_doc_id_passes_through(spark):
    # r13 review finding: int(NaN) crashed the job on one NULL id while
    # the relational twin passed the row through null-safely.
    merges = bpe_train(
        spark.createDataFrame([(1, "aa ab aa")], "doc_id long, text string"),
        4,
    )
    docs = spark.createDataFrame(
        [(1, "aa ab"), (None, "aa")], "doc_id long, text string"
    )
    rows = bpe_encode(docs, merges).collect()
    ids = {r["doc_id"] for r in rows}
    assert None in ids and 1 in ids


def test_bpe_train_encode_lowercase_parity(spark):
    # r13 review finding candidate: the train side lowercases with JVM
    # F.lower, the encode side with Python str.lower — pin that both
    # produce the same words on locale-sensitive code points.
    from pyspark.sql import functions as F

    probe = "I İ ß ΣIGMA STRAßE"
    jvm = (
        spark.createDataFrame([(probe,)], "t string")
        .select(F.split(F.lower("t"), r"\s+").alias("w"))
        .first()["w"]
    )
    py = [w for w in probe.lower().split()]
    assert jvm == py


def test_token_counts_equal_relational_fold(spark):
    """r15 optimization regression pin: bpe_token_counts now computes
    per-word token lengths with the _encode_word kernel (mapInPandas)
    instead of the nested F.aggregate fold chain.  The fold still lives
    in bpe_encode_relational — pin the kernel path against it on real
    sf documents so the two rewrite semantics can never drift (the
    sequential-rank-order == greedy-lowest-rank equality both rely
    on)."""
    import duckdb

    from pandas_sigproc_spark.operators.bpe import (
        bpe_encode_relational,
        bpe_token_counts,
    )

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
            " ORDER BY doc_id LIMIT 150"
        ).fetchall()
    ]
    docs = _docs_df(spark, texts)
    merges = bpe_train(docs, 12)
    want = {
        r.doc_id: r.n_tokens
        for r in bpe_encode_relational(docs, merges).collect()
        if r.n_tokens > 0
    }
    got = {
        r.doc_id: r.n_tokens
        for r in bpe_token_counts(docs, merges).collect()
    }
    assert got == want
