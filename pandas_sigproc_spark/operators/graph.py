"""Connected components over a pair graph (near-dup clustering).

The dedup pipeline's LSH/Jaccard stages emit near-duplicate *pairs*
(SURVEY.md §2.11 extensions); turning pairs into duplicate *groups* — so a
corpus keeps exactly one representative per group even when duplicates
chain A~B~C without A~C — is a connected-components problem.  The
reference has no graph surface at all; this is engine-extension scope,
built the idiomatic-Spark way: iterative min-label propagation with plain
joins/aggregations, no GraphX dependency and nothing driver-side but the
convergence check.

Scale shape: each iteration is one equi-join of the (symmetrized) edge
list against the current labels plus a min-aggregation, followed by one
round of pointer jumping (label <- label of label), so the distance a
label has traveled at least DOUBLES each round (d -> 2d+2 on a path):
convergence in O(log diameter) rounds, not O(diameter) — a
million-doc-long chain of templated near-dups costs ~20 rounds, not a
million.  Each round is a bounded number of shuffles on
ids.  Lineage is cut with localCheckpoint every iteration so the plan
does not grow exponentially; the convergence check rides on the same job
that materializes the checkpoint (sum of labels is monotonically
non-increasing and strictly decreases until fixpoint, so equal
consecutive sums == converged, with no second action).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F

_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}


def _require_integral(df: DataFrame, cols: list[str], what: str) -> None:
    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) not in _INTEGRAL:
            raise TypeError(
                f"connected_components: {what}.{c} has type {dtypes.get(c)!r}; "
                "ids must be integral (string/UUID ids would silently become "
                "NULL under cast('long') — map them to longs first)"
            )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iterations: int = 50,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Label every vertex with the smallest vertex id reachable from it.

    ``edges`` is an undirected pair list (each pair listed once is
    enough).  ``vertices`` optionally supplies the full vertex universe
    (isolated vertices become their own singleton components — exactly
    what corpus dedup needs, since most documents have no near-dup at
    all); defaults to the ids appearing in ``edges``.

    Returns ``(id, component)`` with ``component`` = min reachable id.

    Ids must be integral columns: a silent ``cast('long')`` of string/UUID
    ids would turn every non-numeric id into NULL and corrupt components,
    so non-integral id dtypes raise up front — map such ids to dense longs
    first (e.g. ``F.xxhash64`` is NOT enough, it can collide; use a
    ``monotonically_increasing_id``/join mapping).
    """
    _require_integral(edges, [src, dst], "edges")
    if vertices is not None:
        _require_integral(vertices, [id_col], "vertices")
    # A NULL endpoint (upstream outer join, say) constrains nothing and
    # would crash the single-task union-find (NaN after Arrow's
    # long-with-nulls -> float64) while the iterative path emitted a junk
    # (NULL, NULL) row — drop half-edges up front so both paths agree.
    e = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("t")
    ).filter(F.col("s").isNotNull() & F.col("t").isNotNull())
    # Materialize the symmetrized edge list once: it is joined EVERY
    # round, and the upstream pair plan (an LSH self-join in the dedup
    # pipeline) must not be re-executed per iteration.
    sym = e.unionByName(
        e.select(F.col("t").alias("s"), F.col("s").alias("t"))
    ).localCheckpoint(eager=True)

    # Iterate ONLY over edge-touched vertices: any vertex with no edge is
    # its own component forever, and in corpus dedup the near-dup subset
    # is a sliver of the corpus — looping over all documents would drag
    # the full vertex table through every join round.  The untouched rest
    # joins back as singletons once, at the end.
    edge_verts = sym.select(F.col("s").alias("id")).distinct()

    # Single-task collapse: when the (symmetrized) edge list is small —
    # the COMMON case, since near-dup edges are a sliver of any corpus —
    # path-compressed union-find in ONE executor task replaces ~log(D)
    # rounds of join+agg jobs, each with its own scheduling floor.  The
    # count is one cheap job over the already-checkpointed edges; the
    # iterative path remains for edge lists too big for one task (raise
    # or lower local_threshold to taste; 1M symmetric edges ≈ 16 MB).
    if sym.count() <= local_threshold:
        labels = (
            sym.withColumn("_g", F.lit(0))
            .groupBy("_g")
            .applyInPandas(
                lambda pdf: _union_find_pdf(pdf.drop(columns=["_g"])),
                "id long, component long",
            )
        )
        return _with_singletons(labels, edge_verts, vertices, id_col)

    labels = edge_verts.select("id", F.col("id").alias("component"))
    prev_sum = None
    converged = False
    for _ in range(max_iterations):
        # One hop of neighbor-min propagation...
        nbr = sym.join(
            labels, sym["t"] == labels["id"], "inner"
        ).select(F.col("s").alias("id"), "component")
        labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # ...then pointer jumping: component <- component's component.
        # Labels only shrink (component <= id invariant holds for every
        # row of `labels`), so the left join always finds its parent and
        # the distance a label has traveled at least doubles per round.
        parent = labels.select(
            F.col("id").alias("component"), F.col("component").alias("_pc")
        )
        labels = (
            labels.join(parent, "component", "left")
            .select("id", F.coalesce("_pc", "component").alias("component"))
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # Practically unreachable with pointer jumping (O(log diameter)
        # rounds), but silence here would be undetectable if it happened.
        warnings.warn(
            f"connected_components: label propagation did not reach a "
            f"fixpoint within max_iterations={max_iterations}; returned "
            "components may be unconverged — raise max_iterations",
            RuntimeWarning,
            stacklevel=2,
        )

    return _with_singletons(labels, edge_verts, vertices, id_col)


def _union_find_pdf(pdf):
    """Path-compressed, min-root union-find over one in-memory edge batch.

    Choosing the smaller root as parent at every union makes the final
    root of each tree the component's minimum id — the same canonical
    labeling the iterative min-propagation converges to.
    """
    import pandas as pd

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for s, t in zip(pdf["s"].to_numpy(), pdf["t"].to_numpy()):
        rs, rt = find(int(s)), find(int(t))
        if rs != rt:
            if rt < rs:
                rs, rt = rt, rs
            parent[rt] = rs
    # sym lists both directions, so column s alone covers every vertex
    ids = {int(v) for v in pdf["s"].to_numpy()}
    return pd.DataFrame(
        sorted((i, find(i)) for i in ids), columns=["id", "component"]
    )


def _with_singletons(labels, edge_verts, vertices, id_col):
    if vertices is None:
        return labels
    verts = vertices.select(F.col(id_col).cast("long").alias("id")).distinct()
    singles = verts.join(edge_verts, "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return labels.unionByName(singles)
