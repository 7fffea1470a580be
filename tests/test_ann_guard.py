"""The brute-force cosine baseline refuses oversized cartesian plans."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import cosine_topk_bruteforce


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(40, dtype=np.int64),
            "v": list(rng.standard_normal((40, 8))),
        }
    )
    return spark.createDataFrame(pdf)


def test_guard_fires_above_max_pairs(vecs):
    q = vecs.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    with pytest.raises(ValueError, match="ann_lsh / ann_ivf / ann_int8"):
        cosine_topk_bruteforce(vecs, q, k=3, max_pairs=100)


def test_guard_off_and_results(vecs):
    q = vecs.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    out = cosine_topk_bruteforce(vecs, q, k=3, max_pairs=None).toPandas()
    assert set(out["qid"]) == {0, 1, 2, 3}
    assert out.groupby("qid")["rank"].max().eq(3).all()
    # verify against numpy
    pdf = vecs.toPandas().sort_values("vec_id")
    M = np.stack(pdf["v"].to_numpy())
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = M @ M.T
    for qid in range(4):
        s = sims[qid].copy()
        s[qid] = -np.inf
        expect = np.argsort(-s, kind="stable")[:3]
        got = out[out.qid == qid].sort_values("rank")["vec_id"].to_numpy()
        assert np.array_equal(got, expect)
