"""Embedding k-means operator (operators/kmeans.py)."""

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.operators.kmeans import kmeans_embeddings


def _emb(spark, n=40, d=4, seed=3):
    rng = np.random.default_rng(seed)
    # two well-separated blobs so convergence is unambiguous
    pts = np.concatenate(
        [rng.normal(0, 0.1, (n // 2, d)), rng.normal(5, 0.1, (n // 2, d))]
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(n), "embedding": [list(map(float, p)) for p in pts]}
        )
    )


def _numpy_kmeans(pts, k, iters):
    cents = pts[:k].copy()
    assign = None
    for _ in range(iters):
        d = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        new = []
        for c in range(k):
            m = pts[assign == c]
            if len(m):
                new.append((c, m.mean(axis=0), len(m)))
        cents = np.stack([v for _, v, _ in new])
        ids = [c for c, _, _ in new]
    return ids, cents, assign


@pytest.mark.parametrize("exact", [False, True])
def test_kmeans_matches_numpy_lloyd(spark, exact):
    df = _emb(spark)
    out = kmeans_embeddings(df, k=2, iters=2, exact_sums=exact).toPandas()
    pts = np.array(
        [r for r in df.toPandas().sort_values("vec_id")["embedding"]], dtype=float
    )
    ids, cents, assign = _numpy_kmeans(pts, 2, 2)
    got = out.pivot(index="cluster", columns="dim", values="c").to_numpy()
    assert np.allclose(got, cents, rtol=0, atol=1e-12)
    counts = out.groupby("cluster")["n"].first()
    for i, c in enumerate(ids):
        assert counts[c] == (assign == c).sum()


def test_kmeans_exact_sums_partition_invariant(spark):
    # The ordered-fold mode is a pure function of the data: identical
    # bits regardless of how the input is partitioned.
    df = _emb(spark, n=60)
    a = kmeans_embeddings(df.repartition(1), k=3, iters=2, exact_sums=True).toPandas()
    b = kmeans_embeddings(df.repartition(7), k=3, iters=2, exact_sums=True).toPandas()
    key = ["cluster", "dim"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert (a["c"].to_numpy() == b["c"].to_numpy()).all()
    assert (a["n"].to_numpy() == b["n"].to_numpy()).all()


def test_kmeans_validates_args(spark):
    df = _emb(spark, n=8)
    with pytest.raises(ValueError):
        kmeans_embeddings(df, k=0)
    with pytest.raises(ValueError):
        kmeans_embeddings(df, iters=0)
