"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): select pretraining documents whose
hashed bag-of-words distribution looks like a TARGET domain, by
importance weighting against the raw corpus distribution and sampling
with Gumbel top-k.

The engine's relational form (beyond the reference, which is
signal-processing only — this is the LLM-data-pipeline tier's
selection operator, SURVEY.md §2.11):

1. **Feature hashing** — every whitespace token maps to one of
   ``buckets`` hashed features via the engine's portable 60-bit md5
   hash (``text.hash60_sql`` — the identical arithmetic every DuckDB
   oracle mirror replays).
2. **Distribution fit** — ONE aggregation over the exploded tokens
   yields both the target and raw bucket counts (target = rows passing
   ``target_pred``; raw = the whole corpus, target included, per the
   paper).  Laplace-``alpha`` smoothing on both.
3. **Per-document importance weight** — ``sum over tokens of
   log p_target(bucket) / p_raw(bucket)``: the exploded tokens
   broadcast-join the (``buckets``-row) log-ratio table and partial-agg
   back to one row per document — the corpus never shuffles, only
   token->doc partial sums do.
4. **Gumbel top-k** (``dsir_select``) — sampling without replacement
   proportional to ``exp(weight/temperature)`` == taking the top-k of
   ``weight/temperature + Gumbel(0,1)``; the Gumbel draw is RNG-free
   (the deterministic salted-hash uniform of ``sample_bucket_expr``),
   so reruns and the DuckDB oracle reproduce the exact selection.

Scale shape: two passes over the corpus tokens (fit + score — the
same two passes the reference implementation makes), each a map-side
explode; the fit's shuffle is ``buckets`` keys of partial counts, the
scoring shuffle is one partial-summed row per document; the log-ratio
table (``buckets`` rows) broadcasts; selection is a global top-k
(TakeOrderedAndProject — no full sort materializes).

Float policy: the per-document weight is a float SUM, so it is rounded
to 6 dp on both engines before the Gumbel key is added (the engine's
nudge+round contract); the key is rounded again so the top-k boundary
is decided on identical numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from pandas_sigproc_spark.operators.text import SAMPLE_MOD, hash60_sql

DSIR_BUCKETS = 1024
_GUMBEL_SALT = ":dsir"
#: Added before every cross-engine ROUND (the engine's nudge+round
#: contract, cf. __spark_entry__._NUDGE): the weight is a float SUM
#: whose association order differs between Spark and DuckDB, so a sum
#: landing exactly on a .5e-6 rounding boundary could round apart; the
#: nudge moves structured values off the boundary identically on both
#: engines (it is far above the ~1e-12 summation drift and far below
#: the 5e-7 half-step).
DSIR_NUDGE = 1e-9


def _bucket_expr(word_sql: str, buckets: int) -> str:
    # hash60 is non-negative (< 2**60), so % == pmod on both engines
    return f"pmod({hash60_sql(word_sql)}, {int(buckets)})"


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    *,
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance weight: ``(doc_id long, weight
    double [rounded 6dp], n_tokens long)``.

    ``target_pred`` marks the documents whose distribution defines the
    target domain (e.g. ``F.col("lang") == "en"``); a NULL predicate
    value counts as non-target.  NULL text counts as the single empty
    token (the corpus-wide NULL-as-empty rule), so every document gets
    a weight.
    """
    if buckets < 2:
        raise ValueError(f"need buckets >= 2, got {buckets}")
    if alpha <= 0:
        raise ValueError(
            f"need alpha > 0 (zero-count buckets must stay finite), got {alpha}"
        )
    # NULL text -> [''] (one empty token) so the doc still scores
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(target_pred, F.lit(False)).alias("is_t"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "w"
        ),
    ).select(
        "doc_id",
        "is_t",
        F.expr(_bucket_expr("w", buckets)).alias("bucket"),
    )
    bs = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("n_t"),
        F.count("*").alias("n_r"),
    )
    tot = bs.agg(F.sum("n_t").alias("NT"), F.sum("n_r").alias("NR"))
    a, b = float(alpha), float(alpha) * buckets
    lr = bs.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("n_t") + a) / (F.col("NT") + b))
            - F.log((F.col("n_r") + a) / (F.col("NR") + b))
        ).alias("log_ratio"),
    )
    return (
        toks.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("log_ratio") + DSIR_NUDGE, 6).alias("weight"),
            F.count("*").alias("n_tokens"),
        )
    )


def gumbel_key_expr(
    weight: Column, id_col: str = "doc_id", temperature: float = 1.0
) -> Column:
    """``weight/temperature + Gumbel(0,1)`` with the Gumbel drawn from
    the deterministic salted-hash uniform (RNG-free, reproducible on
    both engines): ``u = (hash60(id || ':dsir') % SAMPLE_MOD + 0.5) /
    SAMPLE_MOD`` and ``g = -ln(-ln(u))``.  Rounded to 6dp so the top-k
    boundary compares identical numbers cross-engine."""
    u = (
        F.expr(
            f"pmod({hash60_sql(f'concat(cast({id_col} as string), {_GUMBEL_SALT!r})')},"
            f" {SAMPLE_MOD})"
        )
        + 0.5
    ) / float(SAMPLE_MOD)
    return F.round(
        weight / float(temperature) + -F.log(-F.log(u)) + DSIR_NUDGE, 6
    )


def dsir_select(
    docs: DataFrame,
    target_pred: Column,
    k: int,
    *,
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select ``k`` documents by DSIR Gumbel top-k: ``(doc_id, weight,
    n_tokens, gkey)``, the sampled-without-replacement draw proportional
    to ``exp(weight/temperature)``.  Deterministic: the Gumbel noise is
    the salted-hash uniform, ties break by doc_id."""
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    if temperature <= 0:
        raise ValueError(f"need temperature > 0, got {temperature}")
    w = dsir_weights(
        docs,
        target_pred,
        buckets=buckets,
        alpha=alpha,
        id_col=id_col,
        text_col=text_col,
    )
    out = w.select(
        "doc_id",
        "weight",
        "n_tokens",
        gumbel_key_expr(
            F.col("weight"), id_col="doc_id", temperature=temperature
        ).alias("gkey"),
    )
    return out.orderBy(F.desc("gkey"), "doc_id").limit(int(k))


def dsir_duckdb_sql(
    *,
    target_sql: str,
    k: int,
    buckets: int = DSIR_BUCKETS,
    alpha: float = 1.0,
    temperature: float = 1.0,
    src: str = "documents",
) -> str:
    """The DuckDB mirror of :func:`dsir_select` — GENERATED from the
    same constants so the engines cannot drift (the normalize_text
    single-homing rule).  ``target_sql`` is the predicate over ``src``
    columns (NULL counts as non-target via COALESCE)."""
    a, b = float(alpha), float(alpha) * buckets
    h60 = "CAST(CONCAT('0x', SUBSTR(MD5({x}), 1, 15)) AS BIGINT)"
    bucket = h60.format(x="w") + f" % {int(buckets)}"
    gu = (
        "(" + h60.format(x="CONCAT(CAST(doc_id AS VARCHAR), ':dsir')")
        + f" % {SAMPLE_MOD} + 0.5) / {float(SAMPLE_MOD)}"
    )
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, is_t, {bucket} AS bucket
  FROM (
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           COALESCE({target_sql}, FALSE) AS is_t,
           UNNEST(STR_SPLIT(COALESCE(text, ''), ' ')) AS w
    FROM {src}
  )
),
bs AS (
  SELECT bucket,
         SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS n_t,
         COUNT(*) AS n_r
  FROM toks GROUP BY bucket
),
tot AS (SELECT SUM(n_t) AS NT, SUM(n_r) AS NR FROM bs),
lr AS (
  SELECT bucket,
         LN((n_t + {a}) / (NT + {b})) - LN((n_r + {a}) / (NR + {b}))
           AS log_ratio
  FROM bs, tot
),
w AS (
  SELECT doc_id,
         ROUND(SUM(log_ratio) + {DSIR_NUDGE!r}, 6) AS weight,
         COUNT(*) AS n_tokens
  FROM toks JOIN lr USING (bucket) GROUP BY doc_id
)
SELECT doc_id, weight, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(weight / {float(temperature)} + -LN(-LN({gu}))
             + {DSIR_NUDGE!r}, 6) AS gkey
FROM w
ORDER BY gkey DESC, doc_id
LIMIT {int(k)}
"""


__all__ = [
    "DSIR_BUCKETS",
    "dsir_weights",
    "dsir_select",
    "dsir_duckdb_sql",
    "gumbel_key_expr",
]
