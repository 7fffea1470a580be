"""Embedding k-means (fixed-iteration Lloyd's) — cluster-based corpus
curation for training-data pipelines.

Clustering embeddings is the workhorse behind diversity sampling,
cluster-balanced mixes, and semantic dedup at corpus scale.  This
operator runs a FIXED number of Lloyd iterations with deterministic
seeding (the k smallest ids), which makes the whole algorithm a finite
composition of joins + aggregations — declarative, AQE-optimizable, and
(in ``exact_sums`` mode) bit-reproducible on any cluster layout.

Scale shape per iteration: centroids are a k-row broadcast table; the
assignment is a map-side broadcast join + per-row argmin (no shuffle of
the corpus); the update is one partial-aggregated groupBy(cluster, dim).
That is the canonical distributed k-means plan — O(iters) passes, no
driver-side loops over data.

``exact_sums=True`` computes centroid sums as LEFT FOLDS over members in
id order (array_sort + aggregate) instead of a parallel SUM.  Floating-
point addition is order-sensitive; the ordered fold makes centroids a
pure function of the data — identical bits on 1 executor or 1000 — at
the cost of collecting each (cluster, dim) group into an array, so it
suits audit/replay runs (it is exactly what lets the DuckDB oracle
compare BIT-EXACT with no rounding).  Production runs keep the default
partial-agg SUM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def kmeans_embeddings(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_sums: bool = False,
) -> DataFrame:
    """Fixed-iteration Lloyd's over an ``array<float|double>`` column.

    Returns one row per (cluster, dim): ``(cluster int, n long,
    dim int, c double)`` — the member count and centroid coordinates
    after ``iters`` assign/update rounds.  Ties in the argmin break to
    the smallest cluster id (stable, engine-independent on equal
    distances).
    """
    assigned, cents = _lloyd(df, k, iters, id_col, vec_col, exact_sums)
    counts = assigned.groupBy("cluster").agg(F.count("*").alias("n"))
    return (
        cents.join(counts, "cluster", "left")
        .select(
            "cluster",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.posexplode("c").alias("dim", "c"),
        )
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col("n").cast("long").alias("n"),
            F.col("dim").cast("int").alias("dim"),
            F.col("c").cast("double").alias("c"),
        )
    )


def kmeans_assignments(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_sums: bool = False,
) -> DataFrame:
    """Per-vector cluster assignment after ``iters`` Lloyd rounds:
    ``(vec_id long, cluster int)`` — the input to cluster-balanced
    sampling / semantic curation stages."""
    assigned, _ = _lloyd(df, k, iters, id_col, vec_col, exact_sums)
    return assigned.select(
        F.col("vid").alias(id_col), F.col("cluster").cast("int").alias("cluster")
    )


def _lloyd(df, k, iters, id_col, vec_col, exact_sums):
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    e = df.select(
        F.col(id_col).cast("long").alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    dim = F.size("v")

    # Deterministic seeding: the k smallest ids, cluster = seed rank - 1.
    # orderBy().limit(k) executes as a distributed TakeOrdered (per-
    # partition top-k, O(k) merged at the driver) — NOT a global window,
    # which would funnel the entire embeddings table through one
    # single-partition sort just to pick k rows.  The rank is a broadcast
    # theta-join count over the k seed ids (rank(vid) = #{vid' <= vid}),
    # so no windowing — and no single-partition stage — appears anywhere
    # in seeding.
    seeds = e.select("vid", "v").orderBy("vid").limit(k)
    ids = seeds.select("vid")
    rank = (
        ids.alias("a")
        .join(F.broadcast(ids.alias("b")), F.col("b.vid") <= F.col("a.vid"))
        .groupBy(F.col("a.vid").alias("vid"))
        .agg((F.count("*") - 1).cast("int").alias("cluster"))
    )
    cents = seeds.join(F.broadcast(rank), "vid").select(
        "cluster", F.col("v").alias("c")
    )

    def sqdist(vcol, ccol):
        return F.aggregate(
            F.zip_with(vcol, ccol, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    assigned = None
    for _ in range(iters):
        pairs = e.crossJoin(F.broadcast(cents)).select(
            "vid", "v", "cluster", sqdist(F.col("v"), F.col("c")).alias("d")
        )
        warg = Window.partitionBy("vid").orderBy("d", "cluster")
        assigned = (
            pairs.withColumn("_rk", F.row_number().over(warg))
            .filter(F.col("_rk") == 1)
            .select("vid", "v", "cluster")
        )
        per_dim = assigned.select(
            "cluster",
            "vid",
            F.posexplode("v").alias("dim", "val"),
        )
        if exact_sums:
            summed = per_dim.groupBy("cluster", "dim").agg(
                (
                    F.aggregate(
                        F.transform(
                            F.array_sort(
                                F.collect_list(F.struct("vid", "val"))
                            ),
                            lambda s: s["val"],
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                    / F.count("*")
                ).alias("cval"),
            )
        else:
            summed = per_dim.groupBy("cluster", "dim").agg(
                (F.sum("val") / F.count("*")).alias("cval")
            )
        cents = (
            summed.groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "cval"))),
                    lambda s: s["cval"],
                ).alias("c")
            )
            .select(F.col("cluster").cast("int").alias("cluster"), "c")
        )

    return assigned, cents


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    *,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_sums: bool = False,
    round_digits: int = 6,
    max_cluster_rows: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (after Abbas et al. 2023,
    arXiv:2303.09540): k-means the embeddings, then inside each cluster
    drop every vector that has a higher-similarity earlier twin — keep
    ``x`` iff no ``y`` with ``y.id < x.id`` in the same cluster has
    ``round(cos(x, y), round_digits) >= threshold``.

    Output: ``(id_col long, cluster int, keep boolean)`` — one row per
    input vector, so downstream filters see both kept and dropped rows
    (and the drop rate) without a second pass.

    The dominance rule (compare against ALL smaller ids, not a greedy
    kept-chain) is deterministic, engine-independent, and expressible as
    one self-join — the standard large-scale simplification of the
    paper's per-cluster pruning.  Cosines are rounded before the
    threshold compare so the boundary cannot flip on last-ulp
    summation-order differences between engines.

    Scale shape: the candidate pairs are WITHIN-CLUSTER only, so the
    quadratic blow-up of all-pairs cosine is bounded by the largest
    cluster: cost ~ sum(|c|^2).  k is the knob — at corpus scale pick
    k ≈ N / target_cluster_size (the paper uses ~100k clusters for
    ~100M docs, clusters of ~1k).  Pass ``max_cluster_rows`` to fail
    loudly instead of running an oversized within-cluster pair join: the
    guard is a broadcast per-cluster-size join whose ``raise_error``
    fires INSIDE the same plan — no extra eager job, and it judges the
    exact assignments the pair join consumes (an up-front ``collect``
    would recompute the Lloyd rounds and, in non-``exact_sums`` mode,
    could judge different float-tie assignments than the main run).
    The corpus never shuffles for assignment (broadcast centroids, see
    module docstring); the pair join shuffles on cluster id once.
    """
    assigned, _ = _lloyd(df, k, iters, id_col, vec_col, exact_sums)
    if max_cluster_rows is not None:
        sizes = assigned.groupBy("cluster").agg(F.count("*").alias("_csz"))
        # The guard wraps ``vid`` — the column every downstream join
        # keys on — NOT a projection-only column: column pruning would
        # silently eliminate a guard the query never needs (count()
        # prunes everything but join keys).
        guard = F.when(
            F.col("_csz") > max_cluster_rows,
            F.raise_error(
                F.concat(
                    F.lit("semantic_dedup: cluster "),
                    F.col("cluster").cast("string"),
                    F.lit(" has "),
                    F.col("_csz").cast("string"),
                    F.lit(
                        f" rows, above max_cluster_rows={max_cluster_rows};"
                        " raise k (target k ~ N / desired_cluster_size) or"
                        " lift the guard"
                    ),
                )
            ).cast("long"),
        ).otherwise(F.col("vid"))
        assigned = assigned.join(F.broadcast(sizes), "cluster").select(
            guard.alias("vid"), "v", "cluster"
        )

    def _cos(va, vb):
        def nrm(c):
            return F.sqrt(
                F.aggregate(
                    F.transform(c, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )

        dot = F.aggregate(
            F.zip_with(va, vb, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return dot / (nrm(va) * nrm(vb))

    a = assigned.select("vid", "v", "cluster")
    b = assigned.select(
        F.col("vid").alias("_bvid"), F.col("v").alias("_bv"), "cluster"
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("_bvid") < F.col("vid"))
        .filter(
            F.round(_cos(F.col("v"), F.col("_bv")), round_digits)
            >= F.lit(threshold)
        )
        .select("vid")
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return a.join(dropped, "vid", "left").select(
        F.col("vid").cast("long").alias(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("_drop").isNull().alias("keep"),
    )
