"""Model-based language identification: a fastText-style hashed
character-n-gram linear classifier, fully relational.

The heuristic ``lang_id`` (operators/text.py ``lang_pred_expr``) scores
languages by stopword hits — fine as a coarse gate, wrong on short or
code-heavy documents that contain few function words.  This module adds
the model-based tier every production crawl pipeline runs (CCNet /
RefinedWeb use fastText langid): score label ``l`` as a linear function
of the document's hashed character n-grams.

Architecture (Joulin et al., "Bag of Tricks for Efficient Text
Classification", EACL 2017 — the fastText supervised model, collapsed):
fastText computes ``softmax(W · mean_g E[h(g)])`` over hashed n-grams
``g``; since ``E`` and ``W`` are both linear maps, the composition
collapses to ONE per-(bucket, label) table ``M = E·W`` and the label
score is ``mean_g M[h(g) % B, l]``.  Argmax is invariant under softmax,
so the classifier IS a hashed-n-gram weight lookup + average + argmax.

This engine ships a FIXED, injected ``M`` (the ``quality_classifier``
pattern: public architecture, deterministic weights — training a real
model needs labeled data this sandbox doesn't have).  The lexicon rows
are characteristic character trigrams per language (public linguistic
knowledge: " th"/"ing" mark English, "sch"/"ein" German, "que"/" la"
Romance splits, etc.), hashed into the bucket table exactly like a
trained fastText model's rows would be.

Determinism contract: weights are INTEGER milli-weights and every
aggregate is a BIGINT sum — no float associativity anywhere before the
single final division — so Spark and the DuckDB oracle agree bit-for-bit
on the argmax and to 6 dp on the reported scores.

Scale shape (100 TB): normalize + trigram explode are map-side; the
weight table is a broadcast join (56 rows here; at most ``B`` rows by
construction); the one shuffle is the partially-aggregated
``groupBy(doc_id)`` whose exchange rows are (doc_id, 6 longs) — width
independent of document length.  Zero Python anywhere.
"""

from __future__ import annotations

import hashlib
from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame, functions as F

from pandas_sigproc_spark.operators import text as _text

#: Languages the injected model scores, in argmax priority order.
MODEL_LANGS = ("en", "de", "es", "fr")

#: fastText hashing-trick bucket count (2**20, the fastText default).
LANG_MODEL_BUCKETS = 1 << 20

#: Characteristic character trigrams per language, most-distinctive
#: first (weights decay with position).  ASCII [a-z ] only — the
#: normalizer strips everything else, so any other gram would be dead
#: weight.  Overlaps across languages are intentional: the collapsed
#: table M gives shared grams weight in several labels, exactly like a
#: trained model.
LANG_MODEL_NGRAMS: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", "ing", "ng ", "and", "nd ", " an",
           " of", "of ", " to", "to ", "ed ", "er "),
    "de": (" de", "der", "er ", "ein", " ei", "ich", "ch ", "sch",
           "und", " un", "die", "ie ", "ung", "ten"),
    "es": (" de", "de ", " la", "la ", "el ", " el", "os ", "as ",
           "que", " qu", "ue ", "ent", "cio", "ion"),
    "fr": (" de", "de ", " le", "le ", "es ", "ent", "nt ", " la",
           "ion", "on ", "que", " qu", "eur", "ais"),
}


def _milliweight(rank: int) -> int:
    """Integer milli-weight for a lexicon gram by importance rank:
    1000, 960, 920, ... floored at 200."""
    return max(1000 - 40 * rank, 200)


def lang_model_rows() -> list[tuple[int, int, int, int, int]]:
    """The collapsed weight table ``M`` as ``(bucket, w_en, w_de,
    w_es, w_fr)`` rows, bucket-sorted.  Buckets are the SAME md5 hash
    the query side computes (``conv(substring(md5(g),1,15),16,10) %
    B``); colliding lexicon grams MERGE by summation — the fastText
    hashing-trick semantics (collisions share one row of M)."""
    tbl: dict[int, list[int]] = {}
    for li, lang in enumerate(MODEL_LANGS):
        for rank, g in enumerate(LANG_MODEL_NGRAMS[lang]):
            b = (
                int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                % LANG_MODEL_BUCKETS
            )
            row = tbl.setdefault(b, [0] * len(MODEL_LANGS))
            row[li] += _milliweight(rank)
    return sorted((b, *w) for b, w in tbl.items())


def normalize_expr(text_col: str = "text") -> Column:
    """fastText-style normalization: lowercase, non-letters collapse
    to single spaces, one boundary space each side (so word-initial /
    word-final trigrams like " th" / "ng " exist at document edges).
    Pattern is in the Java/RE2 common subset — the DuckDB oracle
    replays it with the literal same regex (plus DuckDB's 'g' flag;
    Spark replaces all matches by default)."""
    cleaned = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
    return F.concat(F.lit(" "), F.trim(cleaned), F.lit(" "))


def trigrams_expr(norm_col: str = "s") -> Column:
    """Character trigrams of a normalized column — one substring per
    position (linear; no per-gram re-split).  A document shorter than
    3 chars yields its single short prefix, which hashes to an
    unweighted bucket and scores 'und'."""
    return F.expr(
        f"transform(sequence(1, greatest(length({norm_col}) - 2, 1)),"
        f" i -> substring({norm_col}, i, 3))"
    )


def bucket_expr(gram_col: str = "g") -> Column:
    """The engine-portable md5 bucket of a gram (60-bit prefix, mod
    B) — identical in Spark, DuckDB and :func:`lang_model_rows`.
    Composes text.hash60_sql, the single-homed definition every
    oracle-parity site must share (a review finding: this was a hand
    copy)."""
    return F.expr(f"{_text.hash60_sql(gram_col)} % {LANG_MODEL_BUCKETS}")


#: Normalized-trigram alphabet, index order of the dense weight table
#: (``idx('a')=0 .. idx('z')=25, idx(' ')=26``).
_ALPHA = "abcdefghijklmnopqrstuvwxyz "

_TRIGRAM_TABLE = None


def _trigram_weight_table():
    """Dense ``(27**3 + 1, 5)`` int64 table ``[w_en, w_de, w_es, w_fr,
    hit]`` indexed by trigram code ``c0*729 + c1*27 + c2`` over the
    normalized alphabet — the complete gram universe after
    :func:`normalize_expr` (plus one extra last row for the single
    sub-3-char gram ``"  "``, the normalization of empty text).

    Every possible trigram is bucketed with the IDENTICAL md5
    arithmetic the expression path uses (so hashing-trick collisions
    between a lexicon gram and any other trigram reproduce exactly),
    then looked up in the collapsed model M.  Built once per process
    (~19.7k md5s, a few ms) and cached — guide §4's heavyweight-init-
    once rule; the closure ships only table bytes, never recomputes.
    """
    global _TRIGRAM_TABLE
    if _TRIGRAM_TABLE is None:
        import numpy as np

        tbl = {b: w for b, *w in lang_model_rows()}
        W = np.zeros((27 ** 3 + 1, len(MODEL_LANGS) + 1), dtype=np.int64)

        def put(idx, gram):
            b = (
                int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
                % LANG_MODEL_BUCKETS
            )
            w = tbl.get(b)
            if w is not None:
                W[idx, : len(MODEL_LANGS)] = w
                W[idx, -1] = 1

        for i0, c0 in enumerate(_ALPHA):
            for i1, c1 in enumerate(_ALPHA):
                for i2, c2 in enumerate(_ALPHA):
                    put(i0 * 729 + i1 * 27 + i2, c0 + c1 + c2)
        put(27 ** 3, "  ")
        _TRIGRAM_TABLE = W
    return _TRIGRAM_TABLE


_KERNEL_SCHEMA = (
    "doc_id long, heur_idx int, n_grams long, n_hits long, "
    "s_en long, s_de long, s_es long, s_fr long"
)


def _scores_kernel(batches):
    """Arrow-batched twin of the explode → md5-bucket → broadcast-join
    → groupBy aggregate AND the stopword-heuristic expression: one
    per-document pass, zero shuffle (r15 optimization, guide §4.2 —
    the expression path ran one interpreted md5 per CHARACTER of every
    document plus ~45 interpreted HOF stopword scans per row).

    Bit-equivalence: trigram weights come from the precomputed
    :func:`_trigram_weight_table` (same md5 bucket arithmetic, summed
    as int64 — integer addition is exactly associative, so any fold
    order equals Spark's partial aggregate); ``n_grams`` =
    ``greatest(length(s) - 2, 1)`` = the exploded-row count;
    ``split(_txt, ' ')`` == ``str.split(' ')`` (both keep leading and
    trailing empties — the gram_hashes_py-validated equivalence);
    heuristic argmax = first language in LANG_ORDER whose count
    reaches the max == the expression's priority when-chain.  All
    outputs are integers; every float op stays in the relational
    finish, shared with the expression path.
    """
    import numpy as np
    import pandas as pd

    W = _trigram_weight_table()
    stop_map: dict[str, list[int]] = {}
    for li, lang in enumerate(_text.LANG_ORDER):
        for w in _text.LANG_STOPS[lang]:
            stop_map.setdefault(w, []).append(li)
    n_h = len(_text.LANG_ORDER)
    for pdf in batches:
        n = len(pdf)
        heur = np.empty(n, dtype=np.int32)
        sums = np.empty((n, len(MODEL_LANGS) + 1), dtype=np.int64)
        n_grams = np.empty(n, dtype=np.int64)
        for i, (s, txt) in enumerate(zip(pdf["s"], pdf["_txt"])):
            b = s.encode()
            if len(b) >= 3:
                a = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                codes = np.where(a == 32, 26, a - 97)
                keys = codes[:-2] * 729 + codes[1:-1] * 27 + codes[2:]
                sums[i] = W[keys].sum(axis=0)
                n_grams[i] = len(b) - 2
            else:
                sums[i] = W[-1]
                n_grams[i] = 1
            counts = [0] * n_h
            for w in txt.split(" "):
                for li in stop_map.get(w, ()):
                    counts[li] += 1
            mx = max(counts)
            heur[i] = n_h if mx == 0 else counts.index(mx)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "heur_idx": heur,
                "n_grams": n_grams,
                "n_hits": sums[:, -1],
            }
        )
        for li, lang in enumerate(MODEL_LANGS):
            out[f"s_{lang}"] = sums[:, li]
        yield out


def lang_id_model(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "kernel",
) -> DataFrame:
    """Classify each document's language with the hashed-trigram linear
    model AND report disagreement against the stopword heuristic.

    Output: ``(doc_id, pred_lang, score_en, score_de, score_es,
    score_fr, n_grams, n_hits, pred_heur, agree)`` where ``score_l =
    round(milli_sum_l / (1000 * n_grams), 6)`` (the mean gram weight),
    ``n_hits`` counts grams that matched the weight table, and
    ``pred_lang = 'und'`` when no gram matched.  Ties break in
    :data:`MODEL_LANGS` priority order, like the heuristic.

    ``impl='kernel'`` (default) computes the integer per-document
    aggregate in one Arrow pass (:func:`_scores_kernel` — zero
    shuffles); ``impl='expr'`` keeps the original fully-relational
    explode/join/groupBy plan (the streaming-composable form, and the
    reference the kernel is equality-tested against).
    """
    spark = docs.sparkSession
    # null-as-empty (the tier's rule): a NULL text previously yielded
    # pred_heur=NULL/agree=NULL while the model said 'und' — the row
    # vanished from BOTH sides of an agree filter (a review finding)
    base0 = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
    )
    heur_langs = list(_text.LANG_ORDER) + ["und"]
    if impl == "kernel":
        agg = base0.select(
            "doc_id", normalize_expr("_txt").alias("s"), "_txt"
        ).mapInPandas(_scores_kernel, _KERNEL_SCHEMA)
    else:
        wdf = spark.createDataFrame(
            lang_model_rows(),
            "bucket long, w_en long, w_de long, w_es long, w_fr long",
        )
        # The heuristic prediction rides through the per-gram aggregate
        # as an INT index (decoded back to its label after the
        # groupBy): a string min() would push the whole aggregate to
        # SortAggregate, sorting every exploded gram row — int min
        # keeps it a HashAggregate with map-side partial combine.
        heur_idx = (
            F.array_position(
                F.array(*[F.lit(x) for x in heur_langs]),
                _text.lang_pred_expr("ws"),
            ).cast("int")
            - 1
        )
        base = base0.select(
            "doc_id",
            normalize_expr("_txt").alias("s"),
            F.split(F.col("_txt"), " ").alias("ws"),
        ).select(
            "doc_id",
            "s",
            heur_idx.alias("heur_idx"),
        )
        grams = base.select(
            "doc_id",
            "heur_idx",
            F.explode(trigrams_expr("s")).alias("g"),
        )
        joined = grams.select(
            "doc_id", "heur_idx", bucket_expr("g").alias("bucket")
        ).join(F.broadcast(wdf), "bucket", "left")
        agg = joined.groupBy("doc_id").agg(
            F.min("heur_idx").alias("heur_idx"),
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("w_en").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_hits"),
            *[
                F.sum(F.coalesce(F.col(f"w_{lang}"), F.lit(0)))
                .cast("long")
                .alias(f"s_{lang}")
                for lang in MODEL_LANGS
            ],
        )
    heur_decode = F.element_at(
        F.array(*[F.lit(lang) for lang in heur_langs]),
        F.col("heur_idx") + 1,
    )
    pred = F.when(F.col("n_hits") == 0, F.lit("und"))
    for lang in MODEL_LANGS:
        cond = reduce(
            and_,
            [
                F.col(f"s_{lang}") >= F.col(f"s_{other}")
                for other in MODEL_LANGS
                if other != lang
            ],
        )
        pred = pred.when(cond, F.lit(lang))
    return agg.select(
        "doc_id",
        pred.alias("pred_lang"),
        *[
            F.round(
                F.col(f"s_{lang}") / (F.col("n_grams") * F.lit(1000.0)), 6
            ).alias(f"score_{lang}")
            for lang in MODEL_LANGS
        ],
        F.col("n_grams").cast("long").alias("n_grams"),
        "n_hits",
        heur_decode.alias("pred_heur"),
        (pred == heur_decode).alias("agree"),
    )


__all__ = [
    "LANG_MODEL_BUCKETS",
    "LANG_MODEL_NGRAMS",
    "MODEL_LANGS",
    "lang_id_model",
    "lang_model_rows",
]
