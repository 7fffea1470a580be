"""Package-level ANN API (operators/ann.py): the bucketed operators are
callable as library functions with custom parameters — not just through
the driver queries — and basic invariants hold off the default knobs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import (
    cosine_topk_bruteforce,
    int8_lsh_topk,
    ivf_sq8_topk,
    ivf_topk,
    lsh_topk,
)

DIM = 16
N = 400


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((N, DIM))
    # plant known near-neighbors: vec 100+i ~ vec i for the first 10
    for i in range(10):
        base[100 + i] = base[i] + 0.05 * rng.standard_normal(DIM)
    pdf = pd.DataFrame(
        {"vec_id": range(N), "v": [row.tolist() for row in base]}
    )
    return spark.createDataFrame(pdf, "vec_id long, v array<double>")


def _check_shape(out, k, score_col=False):
    pdf = out.toPandas()
    assert set(pdf.columns) >= {"qid", "vec_id", "cos", "rank"}
    if score_col:
        assert "qscore" in pdf.columns
    assert pdf["rank"].max() <= k
    assert (pdf.qid != pdf.vec_id).all()
    # per-query ranks are 1..n without gaps
    for _, g in pdf.groupby("qid"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))
    return pdf


def test_lsh_topk_custom_knobs(vecs):
    out = lsh_topk(vecs, F.col("vec_id") < 10, k=2, tables=4, band=3, dim=DIM)
    pdf = _check_shape(out, 2)
    planted = sum(
        1 for q in range(10)
        if 100 + q in set(pdf[pdf.qid == q]["vec_id"])
    )
    assert planted >= 8  # near-identical vectors co-bucket in some table


def test_ivf_topk_custom_knobs_and_planted_neighbors(vecs):
    out = ivf_topk(vecs, F.col("vec_id") < 10, k=3, nlist=8, nprobe=4)
    pdf = _check_shape(out, 3)
    planted = sum(
        1 for q in range(10)
        if 100 + q in set(pdf[pdf.qid == q]["vec_id"])
    )
    assert planted >= 8  # near-identical vectors rank top-3 when probed


def test_ivf_full_probe_equals_bruteforce(vecs):
    """nprobe == nlist probes every list — IVF degrades to exact search
    and must equal the brute-force baseline pair-for-pair."""
    probe = F.col("vec_id") < 10
    ivf = (
        ivf_topk(vecs, probe, k=3, nlist=8, nprobe=8)
        .select("qid", "vec_id", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    q = vecs.filter(probe).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = (
        cosine_topk_bruteforce(vecs, q, 3)
        .select("qid", "vec_id", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(ivf, bf)


def test_quantized_funnels_custom_knobs(vecs):
    for fn in (
        lambda: int8_lsh_topk(
            vecs, F.col("vec_id") < 10, k=2, funnel=5, tables=4, band=3, dim=DIM
        ),
        lambda: ivf_sq8_topk(
            vecs, F.col("vec_id") < 10, k=2, funnel=5, nlist=8, nprobe=4
        ),
    ):
        pdf = _check_shape(fn(), 2, score_col=True)
        assert len(pdf) > 0


def test_dim_mismatch_raises_instead_of_bucket_collapse(spark, vecs):
    """Vectors shorter than the plane dim used to null-pad every plane
    dot and silently collapse every bucket to 0 (a full cross join);
    the bucket expression must raise instead."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError), match="plane dim"):
        # default dim=64 against 16-d vectors
        lsh_topk(vecs, F.col("vec_id") < 5, k=2).collect()


def test_ivf_with_trained_kmeans_quantizer(vecs):
    """A trained coarse quantizer (kmeans_embeddings -> centroids table)
    plugs into ivf_topk/ivf_sq8_topk; full-probe IVF over the trained
    centroids still equals brute force (assignment partitions the
    corpus; probing every list restores exactness regardless of where
    the centroids came from)."""
    from pandas_sigproc_spark.operators import (
        centroids_from_kmeans,
        kmeans_embeddings,
    )

    km = kmeans_embeddings(vecs, k=6, iters=2, vec_col="v")
    cents = centroids_from_kmeans(km)
    assert cents.count() == 6
    assert len(cents.first()["cv"]) == DIM

    probe = F.col("vec_id") < 10
    out = ivf_topk(vecs, probe, k=3, nprobe=3, centroids=cents)
    pdf = _check_shape(out, 3)
    planted = sum(
        1 for q in range(10) if 100 + q in set(pdf[pdf.qid == q]["vec_id"])
    )
    assert planted >= 8  # near-identical vectors share a trained list

    full = (
        ivf_topk(vecs, probe, k=3, nprobe=6, centroids=cents)
        .select("qid", "vec_id", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    q = vecs.filter(probe).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = (
        cosine_topk_bruteforce(vecs, q, 3)
        .select("qid", "vec_id", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(full, bf)

    sq8 = ivf_sq8_topk(vecs, probe, k=2, funnel=5, nprobe=3, centroids=cents)
    assert _check_shape(sq8, 2, score_col=True).shape[0] > 0


def test_ivf_pq_planted_neighbors_and_codebook_exactness(vecs):
    from pandas_sigproc_spark.operators import ivf_pq_topk

    probe = F.col("vec_id") < 10
    out = ivf_pq_topk(
        vecs, probe, k=3, m=4, ksub=32, dim=DIM, funnel=40, nprobe=16
    )
    pdf = _check_shape(out, 3, score_col=True)
    # the planted near-identical vector survives PQ + ADC for most
    # queries (it shares subspace codes with its twin)
    planted = sum(
        1 for q in range(10) if 100 + q in set(pdf[pdf.qid == q]["vec_id"])
    )
    assert planted >= 8
    # codebook members reconstruct EXACTLY: when the retrieved vector is
    # one of the ksub codebook rows, its ADC score IS the true cosine
    # (rounded 6) — the crispest self-check of the codes/LUT plumbing
    member = pdf[(pdf.vec_id < 32)]
    assert len(member) > 0
    assert (member["qscore"] == member["cos"]).all()


def test_ivf_pq_full_probe_full_funnel_equals_bruteforce(vecs):
    from pandas_sigproc_spark.operators import ivf_pq_topk

    probe = F.col("vec_id") < 6
    full = (
        ivf_pq_topk(
            vecs, probe, k=3, m=4, ksub=32, dim=DIM,
            funnel=N, nprobe=32,
        )
        .select("qid", "vec_id", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    q = vecs.filter(probe).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    bf = (
        cosine_topk_bruteforce(vecs, q, 3)
        .select("qid", "vec_id", "rank")
        .toPandas()
        .sort_values(["qid", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(full, bf)


def test_multiprobe_masks_validation():
    from pandas_sigproc_spark.operators.ann import multiprobe_masks

    assert multiprobe_masks(4, 0) == [0]
    assert sorted(multiprobe_masks(4, 1)) == [0, 1, 2, 4, 8]
    assert len(multiprobe_masks(4, 2)) == 1 + 4 + 6
    assert len(multiprobe_masks(4, 4)) == 16
    with pytest.raises(ValueError):
        multiprobe_masks(4, 5)
    with pytest.raises(ValueError):
        multiprobe_masks(4, -1)


def test_ivf_pq_validation(vecs):
    from pandas_sigproc_spark.operators import ivf_pq_topk

    with pytest.raises(ValueError, match="must divide"):
        ivf_pq_topk(vecs, F.col("vec_id") < 5, m=5, dim=DIM)


def test_ivf_pq_with_trained_codebook(vecs):
    """A k-means-trained PQ codebook injects through `codebook` exactly
    like the coarse tier's trained quantizer — and beats nothing here
    (the corpus is random), but the planted twins must still surface
    and the shape contract must hold."""
    from pandas_sigproc_spark.operators import (
        centroids_from_kmeans,
        ivf_pq_topk,
        kmeans_embeddings,
    )

    km = kmeans_embeddings(vecs, k=32, iters=2, id_col="vec_id", vec_col="v")
    cb = centroids_from_kmeans(km).select(
        F.col("cid").alias("cb_id"), F.col("cv")
    )
    out = ivf_pq_topk(
        vecs, F.col("vec_id") < 10, k=3, m=4, dim=DIM,
        funnel=40, nprobe=16, codebook=cb,
    )
    pdf = _check_shape(out, 3, score_col=True)
    planted = sum(
        1 for q in range(10) if 100 + q in set(pdf[pdf.qid == q]["vec_id"])
    )
    assert planted >= 8


def _plan_counts(df):
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffles": len(re.findall(r"Exchange hashpartitioning", plan))
        + len(re.findall(r"Exchange rangepartitioning", plan)),
        "python": plan.count("FlatMapGroupsInPandas")
        + plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython"),
    }


def test_plan_shapes_pinned(vecs):
    """The scale contract as a regression test: the multiprobe fan-out
    must stay map-side (no new exchange OR Python stage vs the
    probe-own-bucket plan), and the Python surface must stay the fixed
    set of vectorized mapInPandas kernels (r15: the interpreted
    higher-order-function folds moved into Arrow-batched NumPy — guide
    §4.2 — so 'Python-free' became 'exactly the N designed vectorized
    stages', never row-at-a-time UDF nodes)."""
    from pandas_sigproc_spark.operators import ivf_pq_topk

    probe = F.col("vec_id") < 10
    lsh = _plan_counts(
        lsh_topk(vecs, probe, k=3, tables=4, band=4, dim=DIM, multiprobe=1)
    )
    lsh0 = _plan_counts(
        lsh_topk(vecs, probe, k=3, tables=4, band=4, dim=DIM, multiprobe=0)
    )
    assert lsh["shuffles"] == lsh0["shuffles"], (lsh, lsh0)
    # encode stage (x2 consumers: corpus + probe side) + pair-cos stage;
    # multiprobe adds NO Python stage (query-side fan-out is pure JVM)
    assert lsh["python"] == lsh0["python"] <= 3, (lsh, lsh0)

    pq = _plan_counts(
        ivf_pq_topk(vecs, probe, k=3, m=4, ksub=32, dim=DIM, funnel=20)
    )
    # corpus encode + probe LUT/ranking + rescore pair-cos — all
    # mapInPandas batch kernels, no row-at-a-time eval nodes
    assert pq["python"] <= 3, pq
    assert pq["shuffles"] <= 3, pq
