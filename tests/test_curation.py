"""Round-6 curation tier (operators/curation.py) vs pure-Python
references: block-level dedup, logistic quality classifier, Bloom
decontamination (exactness + FP determinism), temperature sampling
(threshold math + portability), PII scrubbing (rule chain), plus the
exp() rounding-margin pin for the classifier oracle."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import (
    block_dedup,
    bloom_probe,
    build_bloom_bitmap,
    quality_classifier,
    scrub_pii,
    temperature_sample,
    temperature_thresholds,
)
from pandas_sigproc_spark.operators import curation as C
from pandas_sigproc_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    texts = [
        # doc 0 and 1 share their first 10-word block exactly
        "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 x0 x1 x2 x3 x4 x5 x6 x7 x8 x9",
        "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9 y0 y1 y2 y3 y4 y5 y6 y7 y8 y9",
        # doc 2 repeats its own block twice (intra-doc dup)
        "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9 c0 c1 c2 c3 c4 c5 c6 c7 c8 c9",
        # short doc, under one block
        "z0 z1 z2",
        # the quality spread: stopword-rich prose-ish vs junk
        "the cat is a friend of the dog and the bird is a friend of all",
        "zzzz zzzz zzzz zzzz zzzz zzzz",
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )
    return spark.createDataFrame(pdf), texts


# ---------------------------------------------------------------------------
# block_dedup
# ---------------------------------------------------------------------------


def _py_block_dedup(texts, B=10, min_count=2):
    occ = []  # (doc, bid, btext)
    for d, t in enumerate(texts):
        ws = t.split(" ")
        for k in range(0, max(len(ws), 1), B):
            occ.append((d, k // B + 1, " ".join(ws[k : k + B])))
    counts = Counter(b for _, _, b in occ)
    first = {}
    for d, bid, b in sorted(occ):
        first.setdefault(b, (d, bid))
    out = {}
    for d in range(len(texts)):
        blocks = [(bid, b) for dd, bid, b in occ if dd == d]
        keep = [
            (bid, b)
            for bid, b in blocks
            if counts[b] < min_count or first[b] == (d, bid)
        ]
        out[d] = (
            len(blocks),
            len(blocks) - len(keep),
            " ".join(b for _, b in keep),
        )
    return out


def test_block_dedup_reference(docs):
    df, texts = docs
    got = {r.doc_id: r for r in block_dedup(df).collect()}
    ref = _py_block_dedup(texts)
    for d, (n_blocks, n_dup, clean) in ref.items():
        assert got[d].n_blocks == n_blocks
        assert got[d].n_dup_blocks == n_dup
        assert got[d].clean_text == clean
        assert got[d].dup_frac == pytest.approx(n_dup / n_blocks, abs=1e-6)
    # the shared block survives only in doc 0; doc 2 keeps one copy
    assert got[0].n_dup_blocks == 0
    assert got[1].n_dup_blocks == 1
    assert got[2].n_dup_blocks == 1
    assert got[2].clean_text == "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    # fully-unique short doc unchanged
    assert got[3].clean_text == texts[3]


def test_block_dedup_arg_validation(docs):
    df, _ = docs
    with pytest.raises(ValueError):
        block_dedup(df, 0)
    with pytest.raises(ValueError):
        block_dedup(df, 10, min_count=1)


# ---------------------------------------------------------------------------
# quality_classifier
# ---------------------------------------------------------------------------


def _py_quality(text, weights=C.QUALITY_WEIGHTS):
    ws = text.split(" ")
    n = len(ws)
    f_len = min(1.0, n / 100.0)
    awl = len(text) / n
    f_awl = max(0.0, 1.0 - abs(awl - 4.7) / 4.7)
    f_stop = sum(1 for w in ws if w in T.STOPWORDS) / n
    f_uniq = len(set(ws)) / n
    w0, w1, w2, w3, w4 = weights
    z = w0 + w1 * f_len + w2 * f_awl + w3 * f_stop + w4 * f_uniq
    return f_len, f_awl, f_stop, f_uniq, 1.0 / (1.0 + math.exp(-z))


def test_quality_classifier_reference(docs):
    df, texts = docs
    got = {r.doc_id: r for r in quality_classifier(df).collect()}
    for d, t in enumerate(texts):
        f_len, f_awl, f_stop, f_uniq, score = _py_quality(t)
        assert got[d].f_len == pytest.approx(f_len, abs=1e-6)
        assert got[d].f_awl == pytest.approx(f_awl, abs=1e-6)
        assert got[d].f_stop == pytest.approx(f_stop, abs=1e-6)
        assert got[d].f_uniq == pytest.approx(f_uniq, abs=1e-6)
        assert got[d].score == pytest.approx(score, abs=1e-6)
        assert got[d].keep == (round(score, 6) >= 0.5)
    # stopword-rich prose clearly above the junk doc
    assert got[4].score > got[5].score


def test_quality_exp_margin_vs_duckdb(spark):
    """Pin the exp() cross-engine margin the oracle rounding relies on:
    the pre-round score disagreement between Spark and DuckDB over the
    full sf0.01 corpus must sit orders of magnitude under the 6-dp
    rounding step."""
    import duckdb

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sp = (
        quality_classifier(docs)
        .select("doc_id", "score")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    w = C.QUALITY_WEIGHTS
    du = (
        duckdb.sql(
            f"""
      WITH f AS (SELECT CAST(doc_id AS BIGINT) doc_id,
                        STRING_SPLIT(text,' ') words, LENGTH(text) n_chars
                 FROM '/root/testdata/sf0.01/documents.parquet')
      SELECT doc_id,
        1.0/(1.0+EXP(-({w[0]!r} + {w[1]!r}*LEAST(1.0, LEN(words)/100.0)
          + {w[2]!r}*GREATEST(0.0, 1.0 - ABS(n_chars/LEN(words) - 4.7)/4.7)
          + {w[3]!r}*(LEN(LIST_FILTER(words, x -> x IN ('the','a','of','and','is')))
                      /CAST(LEN(words) AS DOUBLE))
          + {w[4]!r}*(LEN(LIST_DISTINCT(words))/CAST(LEN(words) AS DOUBLE)))))
        AS score
      FROM f
    """
        )
        .df()
        .set_index("doc_id")
        .sort_index()
    )
    # spark side rounds to 6dp inside the operator; compare to the
    # DuckDB RAW score.  |round6(x) - x| <= 5e-7 always, so asserting
    # against the raw value with that margin pins cross-engine agreement
    # without the rounding-tie brittleness of requiring both engines to
    # round a near-boundary value the same way (r6 advice).
    diff = np.abs(sp["score"].to_numpy() - du["score"].to_numpy())
    assert diff.max() <= 5.001e-7, diff.max()


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_probe_exact_on_disjoint_sets(spark):
    """Benchmark grams present -> all flagged; absent -> FP-rate sized
    by the bitmap (zero at this scale)."""
    bench_texts = ["s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"]
    train_texts = [
        "s0 s1 s2 s3 s4 t0 t1 t2 t3 t4",  # one 5-gram shared
        "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9",  # disjoint
        "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9",  # identical -> all flagged
    ]
    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": bench_texts})
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": np.arange(len(train_texts)), "text": train_texts}
        )
    )
    gh = (
        bench.select(T.gram_hash_expr(5).alias("gs"))
        .select(F.explode("gs").alias("h"))
        .distinct()
    )
    bm = build_bloom_bitmap(gh)
    assert len(bm) == C.BLOOM_M_BITS // C.BLOOM_WORD_BITS
    assert all(0 <= x < (1 << 32) for x in bm)
    got = {r.doc_id: r for r in bloom_probe(train, bm, 5).collect()}
    assert got[0].n_flagged == 1 and got[0].n_ngrams == 6
    assert got[1].n_flagged == 0
    assert got[2].n_flagged == got[2].n_ngrams == 6
    assert got[2].flag_frac == 1.0


def test_bloom_matches_exact_decontaminate(spark):
    """At the default sizing the Bloom probe reproduces the exact
    broadcast-join answer on the sf0.01 corpus (zero false positives
    measured — the m=2^16/k=2 sizing it replaced had 111)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(T.gram_hash_expr(5).alias("gs"))
        .select(F.explode("gs").alias("h"))
        .distinct()
    )
    bm = build_bloom_bitmap(bench)
    probe = bloom_probe(docs.filter(F.col("doc_id") % 10 != 0), bm, 5)
    flagged = {
        r.doc_id: r.n_flagged
        for r in probe.filter(F.col("n_flagged") > 0).collect()
    }
    train = docs.filter(F.col("doc_id") % 10 != 0).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(T.gram_hash_expr(5)).alias("h"),
    )
    exact = {
        r.doc_id: r.n
        for r in train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert flagged == exact


# ---------------------------------------------------------------------------
# temperature sampling
# ---------------------------------------------------------------------------


def test_temperature_thresholds_math(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(140, dtype=np.int64),
            "lang": ["en"] * 100 + ["de"] * 30 + ["zh"] * 10,
        }
    )
    df = spark.createDataFrame(pdf)
    thr = {r.lang: r for r in temperature_thresholds(df).collect()}
    w = {l: round(math.sqrt(n) * 1e6) for l, n in (("en", 100), ("de", 30), ("zh", 10))}
    wsum = sum(w.values())
    for lang, n in (("en", 100), ("de", 30), ("zh", 10)):
        target = min(n, math.floor(140.0 * w[lang] / wsum))
        assert thr[lang].n_docs == n
        assert thr[lang].target == target
        assert thr[lang].thr == math.floor(1e6 * target / n)
    # T=2 flattens: the dominant language is cut, the tail kept whole
    assert thr["en"].target < 100
    assert thr["de"].target == 30 and thr["zh"].target == 10


def test_temperature_sample_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(r.doc_id for r in temperature_sample(docs).collect())
    b = sorted(
        r.doc_id
        for r in temperature_sample(docs.repartition(13)).collect()
    )
    assert a == b  # partitioning-invariant, RNG-free
    thr = {r.lang: r.target for r in temperature_thresholds(docs).collect()}
    per = Counter(
        r.lang for r in temperature_sample(docs).collect()
    )
    for lang, target in thr.items():
        # binomial around the target (documented deviation)
        assert abs(per[lang] - target) <= max(10, 0.2 * target)


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------


def test_scrub_pii_rules(spark):
    rows = [
        ("contact bob@example.com now", "contact <EMAIL> now"),
        ("from 192.168.0.1 port 8080", "from <IP> port <NUM>"),
        ("order 12345 for a@b.io", "order <NUM> for <EMAIL>"),
        ("no pii here", "no pii here"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(rows)), "s": [r[0] for r in rows]})
    )
    got = {r.i: r for r in scrub_pii(df, "s").collect()}
    for i, (orig, want) in enumerate(rows):
        assert got[i].s_scrubbed == want, orig
        stripped = want
        for _, rep in C.PII_RULES:
            stripped = stripped.replace(rep, "")
        assert got[i].s_masked_chars == len(orig) - len(stripped)


def test_incremental_dedup_reference(spark):
    ex_texts = {
        0: "e0 e1 e2 e3 e4 e5 e6 e7 e8 e9",
        1: "f0 f1 f2 f3 f4 f5 f6 f7 f8 f9",
    }
    delta_texts = {
        10: "e0 e1 e2 e3 e4 e5 e6 e7 e8 e9",  # exact dup of existing 0
        11: "e0 e1 e2 e3 e4 e5 e6 e7 e8 zz",  # near dup of existing 0
        12: "g0 g1 g2 g3 g4 g5 g6 g7 g8 g9",  # fresh
        13: "g0 g1 g2 g3 g4 g5 g6 g7 g8 g9",  # exact dup of delta 12
        14: "g0 g1 g2 g3 g4 g5 g6 g7 g8 zz",  # near dup of delta 12
    }
    mk = lambda d: spark.createDataFrame(
        pd.DataFrame({"doc_id": list(d), "text": list(d.values())})
    )
    from pandas_sigproc_spark.operators import incremental_dedup

    got = {
        r.doc_id: r
        for r in incremental_dedup(mk(ex_texts), mk(delta_texts)).collect()
    }
    assert len(got) == 5
    assert got[10].is_exact_dup and not got[10].kept
    # 10 shares all 8 shingles with existing 0 -> near count too
    assert got[10].n_near_existing >= 1
    assert not got[11].is_exact_dup
    assert got[11].n_near_existing >= 1 and not got[11].kept
    assert not got[12].is_exact_dup and got[12].n_near_existing == 0
    assert got[12].n_near_delta_earlier == 0 and got[12].kept
    assert got[13].is_exact_dup and not got[13].kept
    assert got[14].n_near_delta_earlier >= 1 and not got[14].kept
    # first-wins: 12 keeps even though 13/14 duplicate it
    assert got[12].kept


def test_incremental_dedup_threshold_validation(spark):
    from pandas_sigproc_spark.operators import incremental_dedup

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a b c"]}))
    with pytest.raises(ValueError):
        incremental_dedup(df, df, near_threshold=0.0)


def test_scrub_pii_plan_is_map_side(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": ["a 1 b"]}))
    plan = (
        scrub_pii(df, "s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_decontaminate_exact_two_table_equals_pred_mode(spark):
    """The separate-benchmark form must equal the same-table bench_pred
    form on the equivalent split, and flag exactly the contaminated
    docs."""
    import random

    from pandas_sigproc_spark.operators import decontaminate_exact

    rng = random.Random(29)
    vocab = [f"w{i}" for i in range(400)]
    texts = [" ".join(rng.choice(vocab) for _ in range(60)) for _ in range(20)]
    # doc 13 copies benchmark doc 0's first 8 words (>= one shared 5-gram)
    texts[13] = " ".join(texts[0].split(" ")[:8]) + " " + texts[13]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "text": texts}),
        "doc_id long, text string",
    )
    pred = F.col("doc_id") % 10 == 0

    got_pred = (
        decontaminate_exact(df, bench_pred=pred)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    got_two = (
        decontaminate_exact(df.filter(~pred), df.filter(pred))
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got_pred, got_two)
    assert 13 in set(got_pred.doc_id)
    assert (got_pred.contam_frac > 0).all()

    with pytest.raises(ValueError, match="exactly one"):
        decontaminate_exact(df)
    with pytest.raises(ValueError, match="exactly one"):
        decontaminate_exact(df, df, bench_pred=pred)


# ---------------------------------------------------------------------------
# Gopher rule-based quality filter
# ---------------------------------------------------------------------------


def test_gopher_rules_per_rule_verdicts(spark):
    good = " ".join(
        ["the quick brown fox jumps over that lazy dog with vigour"] * 6
    )  # 66 words (11 x 6), mean wl ~4.2, required: the/that/with
    texts = {
        0: good,
        # too short (fails min_words only)
        1: "the dog sat with that cat",
        # symbol-heavy: ### plus ellipses push symbol ratio over 0.1
        2: good + " ### ... ... ... ... ... ... ...",
        # bullet lines: 2 of 3 lines start with bullets
        3: "• first\n- second\n" + good,
        # ellipsis line endings: 2 of 3 lines end with ...
        4: "a line...\nanother one…\n" + good,
        # numeric words: alpha fraction collapses
        5: " ".join(["123 456 789 000"] * 15) + " the that",
        # missing required words (only 1 distinct: 'the')
        6: " ".join(["the zebra runs fast"] * 15),
        # mean word length too long
        7: " ".join(["extraordinarily"] * 60) + " the that",
    }
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[k] for k in texts]}
        )
    )
    got = {r.doc_id: r for r in C.gopher_rules(df).collect()}

    assert got[0].keep
    assert not got[1].keep and got[1].n_words < 50
    assert not got[2].keep and got[2].symbol_ratio > 0.1
    assert not got[3].keep and got[3].bullet_frac == pytest.approx(2 / 3)
    assert not got[4].keep and got[4].ellipsis_frac == pytest.approx(2 / 3)
    assert not got[5].keep and got[5].alpha_frac < 0.8
    assert not got[6].keep and got[6].n_required == 1
    assert not got[7].keep and got[7].mean_word_len > 10

    # metric spot-checks against a hand count
    assert got[0].n_words == 66
    assert got[0].n_required == 3  # the / that / with
    assert got[0].bullet_frac == 0.0 and got[0].ellipsis_frac == 0.0


def test_gopher_rules_thresholds_configurable(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["the dog sat with that"]})
    )
    strict = C.gopher_rules(df).collect()[0]
    lax = C.gopher_rules(df, min_words=3).collect()[0]
    assert not strict.keep and lax.keep


def test_gopher_rules_keep_cols_passthrough(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0], "text": ["the dog"], "url_key": ["u"],
             "n_url_dups": [2]}
        )
    )
    row = C.gopher_rules(
        df, keep_cols=("url_key", "n_url_dups")
    ).collect()[0]
    assert row.url_key == "u" and row.n_url_dups == 2
    assert row.n_words == 2


def test_gopher_rules_ellipsis_anchor_crlf_matches_duckdb(spark):
    # \z, not $: Java's default $ matches before a trailing \r, so a
    # CRLF document would count ellipsis-ending lines differently in
    # the two engines.  Both must agree the \r-terminated line is NOT
    # ellipsis-ending.
    import duckdb

    text = "He paused...\r\nShe left...\nDone."
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": [text]}))
    row = C.gopher_rules(df).collect()[0]
    # line 1 ends "...\r" (no match with \z), line 2 ends "..." (match)
    assert row.ellipsis_frac == pytest.approx(1 / 3)

    con = duckdb.connect()
    got = con.execute(
        r"""SELECT LEN(LIST_FILTER(STRING_SPLIT(?, chr(10)),
              l -> regexp_matches(l, '(\.\.\.|' || chr(8230) || ')[ \t]*\z')))""",
        [text],
    ).fetchone()[0]
    assert got == 1


def test_compression_ratio_ordering_anchors(spark):
    import zlib

    texts = {
        0: "spam " * 400,                       # highly repetitive
        1: ("the quick brown fox jumps over the lazy dog and then "
            "discusses signal processing at considerable length ") * 8,
        2: "".join(
            chr(33 + int(c))
            for c in np.random.default_rng(0).integers(0, 90, 2000)
        ),
        3: "",                                   # empty -> ratio 0.0
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {r.doc_id: r for r in C.compression_ratio(df).collect()}
    # repeated << prose << pseudo-random
    assert got[0].ratio < got[1].ratio < got[2].ratio
    assert got[3].ratio == 0.0 and got[3].n_bytes == 0
    # exact vs a local zlib reference at the same level
    for d, t in texts.items():
        raw = t.encode()
        assert got[d].n_bytes == len(raw)
        want = len(zlib.compress(raw, 6)) if raw else 0
        assert got[d].n_compressed == want
        if raw:
            assert got[d].ratio == pytest.approx(
                round(want / len(raw), 6), abs=1e-9
            )


def test_compression_ratio_null_text_is_empty(spark):
    # NULL text must behave like an empty document (n_bytes=0, ratio
    # 0.0), not compress the 4-byte literal "None"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": [None, "abc"]}),
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in C.compression_ratio(df).collect()}
    assert got[0].n_bytes == 0
    assert got[0].n_compressed == 0
    assert got[0].ratio == 0.0
    assert got[1].n_bytes == 3


def test_compression_ratio_level_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["x"]}))
    with pytest.raises(ValueError):
        C.compression_ratio(df, level=0)


# --- round-11 review-finding regressions (text/curation pass) -----------------


def test_temperature_sample_respects_custom_mod(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.curation import temperature_sample

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4000), "lang": ["en"] * 4000})
    )
    # with mod=1000 the bucket must ALSO be mod-1000, or the kept
    # fraction collapses by ~1000x (review finding)
    kept = temperature_sample(docs, mod=1000).count()
    # single language: threshold = mod * target/n ~= mod, so nearly all
    # rows should survive; the broken form kept ~0.1%
    assert kept > 3000


def test_decontaminate_bench_pred_on_non_id_column(spark):
    import pandas as pd
    import pyspark.sql.functions as F

    from pandas_sigproc_spark.operators.curation import decontaminate_exact

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "text": ["a b c d e f", "a b c d e f", "x y z w v u"],
                "split": ["test", "train", "train"],
            }
        )
    )
    # predicate over a non-id column must work (review finding: the
    # gram projection used to drop it -> UNRESOLVED_COLUMN)
    out = decontaminate_exact(
        docs, n=3, bench_pred=F.col("split") == "test"
    ).collect()
    flagged = {r["doc_id"] for r in out}
    assert flagged == {1}  # doc 1 shares all grams with the test doc


def test_incremental_dedup_null_text_keeps_verdict(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.curation import incremental_dedup

    existing = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["some corpus doc here"]})
    )
    delta = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [10, 11], "text": ["fresh delta text", None]}
        ),
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_dedup(existing, delta).collect()}
    # the NULL-text row must receive a verdict, not vanish (review
    # finding: md5(NULL) digests never matched the equi-joins)
    assert set(out) == {10, 11}
    assert out[11]["is_exact_dup"] is False


def test_sample_threshold_expr_empty_dict(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.text import sample_threshold_expr

    df = spark.createDataFrame(pd.DataFrame({"lang": ["en", "de"]}))
    out = df.select(sample_threshold_expr({}, 42).alias("thr")).collect()
    assert [r["thr"] for r in out] == [42, 42]
