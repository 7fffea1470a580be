"""Kernel (mapInPandas ordered-sqdist argmin) Lloyd assignment == the
expression twin, on corpora engineered to hit the tie and edge paths.

The r15 optimization round added a vectorized mapInPandas assignment
(``impl="kernel"``, driver-collected centroids) next to the per-row
interpreted ``array_min(transform(centroids, sqdist-fold))`` form; the
A/B kept "expr" as the default at the gate regime (see
kmeans._KMEANS_IMPL), with the kernel the measured-right choice at
high k*dim.  This pins kernel == expression bit-for-bit
(exact_sums=True makes both paths a pure function of the data, so the
comparison is exact, not tolerance-based) and label-for-label in
production (partial-agg) mode where the argmin margins dominate any
summation jitter.
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pandas_sigproc_spark.operators.kmeans import _lloyd, kmeans_assignments


def _df(spark, vecs):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(vecs)),
                "embedding": [[float(x) for x in v] for v in vecs],
            }
        )
    )


def _both(df, k, iters, exact):
    a_k, c_k = _lloyd(df, k, iters, "vec_id", "embedding", exact, impl="kernel")
    a_e, c_e = _lloyd(df, k, iters, "vec_id", "embedding", exact, impl="expr")
    lab = lambda a: sorted(
        (r["vid"], r["cluster"]) for r in a.select("vid", "cluster").collect()
    )
    return lab(a_k), lab(a_e), c_k, c_e


def test_kernel_equals_expr_exact_mode_bitwise(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16))
    # exact argmin ties: duplicated vectors land at identical distances
    # to every centroid, and duplicated SEED vectors give two centroids
    # at distance 0 from their twins — both must break to the smaller
    # cluster id in both paths.
    vecs[50] = vecs[51]
    vecs[2] = vecs[3]  # ids 2,3 are seeds at k=5 -> duplicate centroids
    df = _df(spark, vecs)
    lk, le, c_k, c_e = _both(df, 5, 2, True)
    assert lk == le
    # exact_sums centroids are a pure function of the data: bit-compare
    ck = sorted(map(tuple, c_k.collect()))
    ce = sorted(map(tuple, c_e.collect()))
    assert ck == ce


def test_kernel_equals_expr_production_mode_labels(spark):
    rng = np.random.default_rng(11)
    # float32-sourced values sum exactly in float64 (the semantic_dedup
    # margin argument), so even production partial-agg centroids are
    # bit-stable here and the label compare is deterministic.
    vecs = rng.normal(size=(150, 8)).astype(np.float32).astype(np.float64)
    df = _df(spark, vecs)
    lk, le, _, _ = _both(df, 6, 2, False)
    assert lk == le


def test_kernel_fewer_rows_than_k(spark):
    vecs = np.eye(3)
    df = _df(spark, vecs)
    lk, le, c_k, c_e = _both(df, 5, 2, True)
    assert lk == le and len(lk) == 3
    assert sorted(map(tuple, c_k.collect())) == sorted(map(tuple, c_e.collect()))


def test_kernel_nan_vector_matches_expr(spark):
    vecs = np.vstack([np.eye(4), np.full((1, 4), np.nan)])
    df = _df(spark, vecs)
    lk, le, _, _ = _both(df, 2, 1, True)
    assert lk == le


def test_public_api_impl_selects_plan(spark):
    rng = np.random.default_rng(3)
    df = _df(spark, rng.normal(size=(40, 8)))
    asg_k = kmeans_assignments(df, k=4, iters=2, exact_sums=True, impl="kernel")
    plan_k = asg_k._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_k
    assert len(asg_k.collect()) == 40
    # the measured default at the gate regime is the expression fold
    # (see kmeans._KMEANS_IMPL) — no Python stage in the default plan
    asg_e = kmeans_assignments(df, k=4, iters=2, exact_sums=True)
    plan_e = asg_e._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_e
