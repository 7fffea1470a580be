"""Similarity search over embedding columns.

The production paths are the bucketed ones registered in the driver
queries (`ann_lsh` — random-hyperplane bucket probe; `ann_ivf` —
coarse-quantizer inverted lists; `ann_int8` — int8 funnel with exact
rescore): each bounds the candidate set per query and broadcasts only
k-row/centroid tables, so the corpus never shuffles.

:func:`cosine_topk_bruteforce` is the EXACT-RECALL BASELINE those are
measured against — a labeled cartesian product.  It refuses to run past
``max_pairs`` (the guard the r4 review asked for): on a corpus of any
real size the cartesian plan is the wrong tool by construction, and the
error message routes users to the bucketed operators instead of letting
a 10^14-pair join quietly saturate a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: Refuse the cartesian baseline above this many (query x corpus) pairs —
#: ~50M pairs x ~128 dims is minutes of vectorized work on one host,
#: already far past where the bucketed ANN operators win.
BRUTE_FORCE_MAX_PAIRS = 50_000_000


def _sq_norm(col):
    return F.aggregate(
        F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "qid",
    query_vec_col: str = "qv",
    max_pairs: int | None = BRUTE_FORCE_MAX_PAIRS,
) -> DataFrame:
    """Exact cosine top-k via a full cartesian scan — the recall baseline.

    Returns ``(qid, vec_id, cos, rank)`` with rank 1..k per query, ties
    broken to the smaller corpus id.  Self-matches (same id) are dropped.

    ``max_pairs`` guards the plan: the constructor counts both sides and
    raises when |queries| x |corpus| exceeds it — pass ``None`` only for
    deliberate offline recall audits.  The two count() jobs are EAGER
    and re-execute each input's full plan, so they are cheap only for
    cheap (scan-shaped) or cached inputs; if either side is an expensive
    derived plan, ``.persist()`` it before calling, or skip the guard
    with an explicit ``max_pairs=None`` after sizing it yourself.
    """
    if max_pairs is not None:
        n_pairs = queries.count() * corpus.count()
        if n_pairs > max_pairs:
            raise ValueError(
                f"cosine_topk_bruteforce: {n_pairs:,} query x corpus pairs "
                f"exceeds max_pairs={max_pairs:,}. This operator is the "
                "exact-recall BASELINE (a true cartesian product) — for "
                "production similarity search use the bucketed ANN plans "
                "(ann_lsh / ann_ivf / ann_int8), or pass max_pairs=None "
                "for a deliberate offline recall audit."
            )
    dot = F.aggregate(
        F.zip_with(F.col(query_vec_col), F.col(vec_col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.sqrt(_sq_norm(F.col(query_vec_col))) * F.sqrt(_sq_norm(F.col(vec_col))))
    pairs = (
        queries.crossJoin(corpus)
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(query_id_col, id_col, cos.alias("cos"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "cos", F.col("rank").cast("int").alias("rank")
        )
    )
