"""Link-graph authority scoring — PageRank over crawl edges.

The crawl-curation companion of the URL tier (``operators/webcrawl.py``
extracts the edges via html_links + url_host): host- or page-level
PageRank is the classic authority prior used to weight or threshold
crawl corpora (alongside the content-quality signals in
``operators/curation.py``).

:func:`pagerank` runs the standard power iteration

    pr_{t+1}(v) = (1-d)/N + d * sum_{(u,v) in E} pr_t(u) / outdeg(u)

for a FIXED iteration count over an edge DataFrame — the fixed count
(rather than a convergence test) keeps the computation deterministic
and lets the DuckDB oracle replay it as an unrolled chain of CTE
stages (the ``link_pagerank`` gate does exactly that).  Dangling
nodes (no out-edges) simply leak their mass, the plain textbook
variant; the redistribution variants are one extra aggregate if a
deployment wants them.

Scale shape: one shuffle per iteration (the contribution groupBy on
the destination key) plus one broadcast-sized node table; lineage is
CUT per iteration with ``localCheckpoint`` (the graph.py rule —
nested join plans otherwise deepen linearly and OOM the driver at
real iteration counts).  The previous iteration's checkpoint blocks
are released by Spark's ContextCleaner once the driver drops its
reference (``Dataset.unpersist`` does NOT release localCheckpoint
storage — it only consults the CacheManager — so this module keeps
exactly one live reference per iteration instead of pretending to
unpersist).  Host-level graphs are millions of nodes at 100 TB — the
per-iteration exchange is on the (uniformly hashed) node key, and a
hot authority (every host links to it) costs one bounded aggregation
task, not a blow-up, because the contribution sum is a partial-agg
groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    *,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank after ``iterations`` power steps over distinct
    ``(src, dst)`` edges: ``(node, rank)``, rank UNROUNDED (round at
    the consumer if hashing — at millions of hosts the interesting
    rank scale is ~1/N, far below any fixed decimal grid).  Nodes are
    the union of both edge endpoints; self-loops count like any other
    edge; duplicate edges are collapsed first (a link is a link, not
    a vote multiplier).  An empty edge set raises ValueError."""
    if iterations < 1:
        raise ValueError("need iterations >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("need 0 < damping < 1")
    d = float(damping)

    # materialize the (possibly expensive) upstream edge plan ONCE —
    # nodes and ew below both derive from this checkpoint instead of
    # re-executing the extraction + distinct shuffle per consumer
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        # NULL endpoints dropped (the graph.py half-edge rule): the
        # documented edge source url_host returns NULL for malformed
        # crawl URIs BY DESIGN, and a surviving NULL became a phantom
        # node — off-by-one N skewing every teleport term, plus a junk
        # (NULL, rank) output row (a review finding)
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("empty link graph: no edges, no nodes")
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # (src, dst, outdeg) once — reused every iteration
    ew = e.join(outdeg, "src").localCheckpoint(eager=True)

    pr = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(int(iterations)):
        contrib = (
            ew.join(pr, ew["src"] == pr["node"])
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        # rebinding pr drops the previous iteration's only reference;
        # the ContextCleaner then releases its checkpoint blocks
        pr = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # cut the per-iteration lineage
        )
    return pr


__all__ = ["pagerank"]
