"""N-gram language-model perplexity scoring — the CCNet quality filter.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) ranks web documents by the
perplexity of a small n-gram LM trained on a trusted reference corpus
(Wikipedia), then splits the corpus into head/middle/tail buckets and
trains on the head.  The reference repo has no LM stage (it is a signal
engine), so this module is engine-extension surface for the
training-data pipeline tier, alongside operators/curation.py.

The model here is an add-alpha bigram LM — the smallest member of the
family with the same distributed shape as a production KenLM job:

    p(w_i | w_{i-1}) = (c2(w_{i-1} w_i) + alpha) / (c1(w_{i-1}) + alpha * (V + 1))

with ``c1``/``c2`` the reference unigram/bigram counts, ``V`` the
reference vocabulary size (types), and the ``+1`` reserving mass for
unseen context words.  A document's score is the average negative
log10-probability per transition:

    log10_ppl(d) = -(1 / T) * sum_i log10 p(w_i | w_{i-1})

(T = token count - 1; single-token documents have no transitions and
are dropped — they carry no LM evidence either way).

Scale shape: training is two partial-aggregated groupBys over the
reference tokens (uniform gram keys); ``V`` is a 1-row aggregate
broadcast into the probability expression.  Scoring explodes each
corpus document into (w1, w2) transition rows built by zipping two
array slices — a LINEAR per-row projection (the tempting
``transform(sequence(...), i -> slice(split(text), i, 2))`` form
re-splits the document once per gram: higher-order-function lambdas get
no common-subexpression elimination) — then probes the bigram and
unigram tables with equi-joins and folds back to one row per doc with a
partial-agg SUM.  The LM tables are dimension-shaped (vocabulary-sized,
not corpus-sized): broadcast them when they fit (the default here), or
let AQE's skew-join splitting absorb the Zipf-hot context words
(``the``, ``of``) when they must shuffle.

Bucketing has two modes mirroring CCNet itself:

- ``thresholds=(t1, t2)``: fixed cutoffs — head <= t1 < middle <= t2 <
  tail on the ROUNDED score.  Pure map-side CASE; this is CCNet's
  production form (its per-language cutoffs are fixed constants
  published with the model).
- ``thresholds="sampled"``: the SCALE-SAFE bootstrap — tercile cutoffs
  derived from a deterministic md5 sample of the scored docs (keep when
  ``hash(doc_id) % sample_mod == 0``) via the exact ``percentile``
  aggregate, rounded, broadcast as a 1-row table, and applied as the
  same map-side CASE as the fixed mode.  NO window anywhere: the
  percentile aggregate's memory is bounded by the sample (pick
  ``sample_mod`` so the sample is ~10^5-10^6 rows at the target corpus;
  the default 4 suits the gate corpora).  An empty sample (sample_mod
  too large for the corpus) RAISES at the first bucketed row rather
  than silently bucketing everything 'tail'.
- ``thresholds=None``: exact in-corpus terciles via NTILE(3) ordered by
  (rounded score, doc_id).  Deterministic and engine-exact, but the
  ntile is a single-partition window over the PER-DOC table (corpus row
  count / ~doc length — far smaller than the corpus, still unbounded):
  the small-SF AUDIT twin of "sampled", not a production mode.

Scores are rounded to ``round_digits`` BEFORE the bucket compare /
ntile ordering so an engine's last-ulp summation-order difference
cannot flip a bucket boundary (the repo-standard measured-margin
rounding; the sum is ~100 log10 terms of magnitude ~1-6, leaving ~9
orders of headroom at the default 6 digits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens_expr(text_col: str):
    """Whitespace tokens with EMPTY STRINGS FILTERED: split(' ') alone
    injects '' tokens for leading/trailing/repeated spaces, which then
    enter the vocabulary and transition rows as phantom words —
    inflating perplexity for cosmetically different but identical text
    (a review finding; bpe._words_expr applies the same rule)."""
    return F.filter(
        F.split(F.col(text_col), " "), lambda w: w != F.lit("")
    )


def _pairs_expr(text_col: str):
    """(w1, w2) transition structs: zip of two slices of ONE split —
    linear per row (no per-gram lambda re-split), empty for 1-token
    docs."""
    ws = _tokens_expr(text_col)
    m = F.greatest(F.size(ws) - 1, F.lit(0))
    return F.zip_with(
        F.slice(ws, 1, m),
        F.slice(ws, 2, m),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def ngram_lm_score(
    docs: DataFrame,
    ref: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    round_digits: int = 6,
    thresholds: tuple[float, float] | str | None = None,
    sample_mod: int = 4,
    broadcast_lm: bool = True,
    persist=None,
) -> DataFrame:
    """Score ``docs`` by add-alpha bigram perplexity under an LM trained
    on ``ref``; bucket head/middle/tail (see module docstring).

    Output: ``(doc_id long, n_trans long, log10_ppl double,
    bucket string)`` — one row per document with >= 1 transition.
    """
    if alpha <= 0:
        raise ValueError("need alpha > 0")
    if isinstance(thresholds, str) and thresholds != "sampled":
        raise ValueError(f"unknown thresholds mode {thresholds!r}")
    if isinstance(thresholds, tuple) and not thresholds[0] <= thresholds[1]:
        raise ValueError("need thresholds t1 <= t2")
    if sample_mod < 1:
        raise ValueError("need sample_mod >= 1")
    pairs = _pairs_expr(text_col)
    # group the unigram table directly under the CONTEXT-word name so the
    # scoring probe is a plain equi-join on "w1"
    rtok = ref.select(F.explode(_tokens_expr(text_col)).alias("w1"))
    uni = rtok.groupBy("w1").agg(F.count("*").alias("c1"))
    big = (
        ref.select(F.explode(pairs).alias("pr"))
        .select(F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
    )
    voc = uni.agg(F.count("*").cast("double").alias("_V"))  # vocab types
    if broadcast_lm:
        uni, big = F.broadcast(uni), F.broadcast(big)

    tok = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(pairs).alias("pr"),
    ).select("doc_id", F.col("pr.w1").alias("w1"), F.col("pr.w2").alias("w2"))
    prob = (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(alpha))) / (
        F.coalesce(F.col("c1"), F.lit(0))
        + F.lit(float(alpha)) * (F.col("_V") + F.lit(1.0))
    )
    scored = (
        tok.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .crossJoin(F.broadcast(voc))
        .select("doc_id", F.log10(prob).alias("_lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_trans"),
            F.round(-F.sum("_lp") / F.count("*"), round_digits).alias(
                "log10_ppl"
            ),
        )
    )
    if isinstance(thresholds, tuple):
        t1, t2 = float(thresholds[0]), float(thresholds[1])
        bucket = (
            F.when(F.col("log10_ppl") <= t1, F.lit("head"))
            .when(F.col("log10_ppl") <= t2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    elif thresholds == "sampled":
        # Deterministic md5 sample of the scored docs -> exact percentile
        # cutoffs (one aggregate, memory bounded by the sample) rounded
        # to the same measured-margin digits as the scores, broadcast as
        # one row, applied map-side.  No window in the plan.
        # the salted shared bucket hash (text.sample_bucket_expr): the
        # old unsalted md5(doc_id) was perfectly correlated with every
        # other unsalted doc_id-hash operator (packing's shard hash),
        # so an upstream filter on the same hash could bias or EMPTY
        # the sample (a review finding — the decorrelation rule
        # sample_bucket_expr's docstring records)
        from pandas_sigproc_spark.operators.text import sample_bucket_expr

        if persist:
            # both the cuts aggregate and the output side consume
            # `scored` — unpersisted, the full explode+join+agg corpus
            # pass runs TWICE (a review finding)
            scored = (
                persist(scored) if callable(persist) else scored.persist()
            )
        samp = scored.filter(
            sample_bucket_expr("doc_id", ":lmppl", mod=int(sample_mod)) == 0
        )
        cuts = samp.agg(
            F.round(
                F.percentile(F.col("log10_ppl"), F.lit(1.0 / 3)), round_digits
            ).alias("_t1"),
            F.round(
                F.percentile(F.col("log10_ppl"), F.lit(2.0 / 3)), round_digits
            ).alias("_t2"),
        )
        scored = scored.crossJoin(F.broadcast(cuts))
        # An empty sample (sample_mod too large for the corpus) yields
        # NULL cutoffs; without a guard every document silently buckets
        # 'tail' — undetectable from the output alone.  Refuse loudly at
        # the first bucketed row instead (costs nothing: the NULL check
        # rides the same map-side CASE).
        empty_sample_guard = F.raise_error(
            F.lit(
                "ngram_lm_score(thresholds='sampled'): the deterministic"
                f" md5 sample is EMPTY (sample_mod={int(sample_mod)} keeps"
                " no scored document in this corpus), so the tercile"
                " cutoffs are NULL and every document would silently"
                " bucket 'tail'. Lower sample_mod or pass fixed"
                " thresholds=(t1, t2)."
            )
        )
        bucket = (
            F.when(
                F.col("_t1").isNull() | F.col("_t2").isNull(),
                empty_sample_guard,
            )
            .when(F.col("log10_ppl") <= F.col("_t1"), F.lit("head"))
            .when(F.col("log10_ppl") <= F.col("_t2"), F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    else:
        nt = F.ntile(3).over(Window.orderBy("log10_ppl", "doc_id"))
        bucket = (
            F.when(nt == 1, F.lit("head"))
            .when(nt == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
        )
    return scored.select(
        "doc_id",
        F.col("n_trans").cast("long").alias("n_trans"),
        "log10_ppl",
        bucket.alias("bucket"),
    )
