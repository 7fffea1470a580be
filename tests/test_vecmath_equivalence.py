"""kernels/vecmath.py == the Catalyst expression folds, bit-for-bit.

The r15 optimization round moved the ANN/embedding tier's map-side math
(plane-dot buckets, normalization, sq8 codes, pair cosines, centroid
ranking, PQ encode) from interpreted higher-order-function expressions
into Arrow-batched NumPy kernels (guide §4.2).  The oracle hashes only
stay green if every emitted double/int is BIT-identical to the old
expression forms — which remain in operators/ann.py as the
specification.  These tests evaluate both forms on the same data and
compare exact bytes (== on doubles, not isclose)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.kernels import vecmath as vm
from pandas_sigproc_spark.operators import ann

DIM = 16
N = 60


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(20260817)


@pytest.fixture(scope="module")
def X(rng):
    base = rng.normal(size=(N, DIM))
    # a few near-duplicate rows to stress tie paths
    base[10] = base[3] + 1e-12
    base[11] = base[3]
    return base


@pytest.fixture(scope="module")
def vecs(spark, X):
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(N), "v": [list(r) for r in X]}
        ),
        "vec_id long, v array<double>",
    )


def test_buckets_match_expression(spark, vecs, X):
    tables, band = 4, 4
    exp = (
        ann.lsh_bucket_keys(vecs, tables=tables, band=band, dim=DIM)
        .orderBy("vec_id", "t")
        .collect()
    )
    signs = ann._plane_sign_matrix(tables, band, DIM)
    got = vm.lsh_buckets(X, signs, band)
    for r in exp:
        assert got[r["vec_id"], r["t"]] == r["bucket"]


def test_normalize_and_pair_cos_match_expression(spark, vecs, X):
    nr = ann._norm(F.col("v"))
    exp_u = {
        r["vec_id"]: np.array(r["u"])
        for r in vecs.withColumn("_nr", nr)
        .select(
            "vec_id",
            F.transform("v", lambda x: x / F.col("_nr")).alias("u"),
        )
        .collect()
    }
    U = X / vm.norms(X)[:, None]
    for i in range(N):
        assert (U[i] == exp_u[i]).all()

    # pair dot fold on every adjacent pair, raw (unrounded) doubles
    a = vecs.select(
        F.col("vec_id").alias("i"), F.col("v").alias("va")
    ).withColumn("j", (F.col("i") + 1) % N)
    b = vecs.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    exp = {
        (r["i"], r["j"]): r["cos"]
        for r in a.join(b, "j")
        .select(
            "i",
            "j",
            (
                ann._dot("va", "vb") / (ann._norm("va") * ann._norm("vb"))
            ).alias("cos"),
        )
        .collect()
    }
    for (i, j), c in exp.items():
        got = vm.ordered_rowdot(X[i : i + 1], X[j : j + 1]) / (
            vm.norms(X[i : i + 1]) * vm.norms(X[j : j + 1])
        )
        assert got[0] == c, (i, j)


def test_sq8_codes_match_expression(spark, vecs, X):
    exp = {
        r["vec_id"]: list(r["code"])
        for r in vecs.crossJoin(F.broadcast(ann._sq8_scales(vecs)))
        .select("vec_id", ann._CODE().alias("code"))
        .collect()
    }
    smax = np.maximum(np.abs(X).max(axis=0), 1e-30)
    got = vm.sq8_codes(X, smax)
    for i in range(N):
        assert list(got[i]) == exp[i]


def test_ranked_cids_match_expression(spark, vecs, X):
    nlist = 8
    ea, ranked = ann._ivf_ranked_centroids(
        vecs, F.col("vec_id") < nlist, None
    )
    exp = {
        r["vec_id"]: [s["cid"] for s in r["rk"]]
        for r in ea.select("vec_id", ranked.alias("rk")).collect()
    }
    cids, C = ann._collect_centroids(vecs, F.col("vec_id") < nlist, None)
    got = ann._ranked_cids(X, cids, C)
    for i in range(N):
        assert list(got[i]) == exp[i], i


def test_pq_codes_match_expression(spark, vecs, X):
    m, ksub = 4, 8
    sub = DIM // m
    nrm = ann._norm(F.col("v"))
    u_expr = F.transform("v", lambda x: x / nrm)
    cb = ann._pq_codebook(vecs, F.col("vec_id") < ksub, None, u_expr)
    exp = {
        r["vec_id"]: list(r["codes"])
        for r in vecs.crossJoin(F.broadcast(cb))
        .select(
            "vec_id",
            ann.pq_codes_expr(u_expr, F.col("cbv"), m=m, sub=sub).alias(
                "codes"
            ),
        )
        .collect()
    }
    CB = ann._collect_codebook(vecs, F.col("vec_id") < ksub, None)
    got = ann._pq_encode_kernel(CB, m, sub)(X)
    for i in range(N):
        assert list(got[i]) == exp[i], i


def test_round9_halfup_matches_spark_round(spark):
    vals = [
        0.1234567895, -0.1234567895, 0.9999999995, -0.9999999995,
        1.5e-10, -1.5e-10, 5e-10, -5e-10, 0.0, -0.0, 1.0, -1.0,
        0.123456789049999, 0.12345678905, 2.0000000005,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    exp = [r["r"] for r in df.select(F.round("x", 9).alias("r")).collect()]
    got = [vm.round9_halfup(v) for v in vals]
    assert got == exp


def test_order_by_round9_tie_semantics(spark):
    # values that differ raw but round9-equal: order must fall back to
    # the id tie-break exactly like array_sort on (round(d, 9), id)
    D = np.array(
        [[0.1000000001, 0.1000000004, 0.30000000199, 0.1000000004]]
    )
    ids = np.array([7, 3, 9, 1], dtype=np.int64)
    df = spark.createDataFrame(
        [([float(x) for x in D[0]],)], "d array<double>"
    ).select(
        F.array_sort(
            F.zip_with(
                "d",
                F.array(*[F.lit(int(i)).cast("long") for i in ids]),
                lambda d, i: F.struct(
                    F.round(d, 9).alias("negcos"), i.alias("cid")
                ),
            )
        ).alias("rk")
    )
    exp = [s["cid"] for s in df.collect()[0]["rk"]]
    got = list(vm.order_by_round9(D, ids)[0])
    assert got == exp


def test_argmin_round9_tie_semantics():
    # raw min is NOT the winner: an earlier index rounds to the same
    # 9-digit value, and the running-min fold keeps the first occurrence
    D = np.array([[0.2, 0.1000000004, 0.1000000001, 0.5]])
    # round9: idx1 -> 0.1, idx2 -> 0.1 — first occurrence = index 1
    assert vm.argmin_round9(D)[0] == 1
    # no ties: plain argmin
    D2 = np.array([[0.3, 0.1, 0.2]])
    assert vm.argmin_round9(D2)[0] == 1
