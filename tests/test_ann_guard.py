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


# --- round-11 review-finding regressions -------------------------------------


def test_zero_norm_vector_scores_zero_not_crash(spark):
    # one all-zero embedding (a failed upstream encoder row) must not
    # abort the job with DIVIDE_BY_ZERO under Spark 4 ANSI — it scores
    # cosine 0 against everything (orthogonal, never a neighbor).
    import pandas as pd
    import pyspark.sql.functions as F

    from pandas_sigproc_spark.operators.ann import lsh_topk

    rows = [(i, [float(i + 1), 1.0, 0.5, 0.25] * 16) for i in range(12)]
    rows.append((99, [0.0] * 64))  # the degenerate row
    vecs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "v"]),
        "vec_id long, v array<double>",
    )
    out = lsh_topk(vecs, F.col("vec_id") < 2, k=3).collect()
    assert out  # job completed
    for r in out:
        if r["vec_id"] == 99:
            assert r["cos"] == 0.0


def test_pq_dim_mismatch_refuses_loudly(spark):
    import pandas as pd
    import pytest

    from pandas_sigproc_spark.operators.ann import pq_code_table

    rows = [(i, [float(i + j) for j in range(128)]) for i in range(40)]
    vecs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "v"]),
        "vec_id long, v array<double>",
    )
    # default dim=64 but the corpus is 128-wide: silent truncation
    # (recall collapse) must be a loud refusal instead.
    with pytest.raises(Exception, match="vector length"):
        pq_code_table(vecs, nlist=4, m=8, ksub=8).collect()


def test_pq_empty_codebook_refuses_loudly(spark):
    import pandas as pd
    import pyspark.sql.functions as F
    import pytest

    from pandas_sigproc_spark.operators.ann import pq_code_table

    # vec_ids start at 1000, so the default codebook_pred (vec_id <
    # ksub) matches NOTHING — the old code encoded [-1]*m silently and
    # the corrupt table detonated later in every probe.
    rows = [(1000 + i, [float(i + j) for j in range(64)]) for i in range(40)]
    vecs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "v"]),
        "vec_id long, v array<double>",
    )
    with pytest.raises(Exception, match="-1 sentinel|codebook"):
        pq_code_table(
            vecs, nlist=4, m=8, ksub=8,
            centroid_pred=F.col("vec_id") < 1004,
        ).collect()


def test_jaccard_pairs_plan_tolerates_ppjoin_tuning_kwargs(spark):
    import pandas as pd

    from pandas_sigproc_spark.operators.dedup import jaccard_near_dupes

    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "text": ["a b c d e", "a b c d f"]}
        )
    )
    # parallelism is a ppjoin-only tuning knob: plan='pairs' must run,
    # not raise TypeError.
    out = jaccard_near_dupes(
        docs, 0.2, plan="pairs", n=2, parallelism=4
    ).collect()
    assert len(out) >= 1


def test_ivf_empty_centroid_selection_is_loud(spark):
    # r13 review finding: vec_ids not starting at 0 made the default
    # centroid_pred select nothing — silently-empty top-k (legacy) or
    # an opaque INVALID_ARRAY_INDEX (ANSI).  Now a named assert.
    from pandas_sigproc_spark.operators.ann import ivf_topk

    from pyspark.sql import functions as F

    vecs = spark.createDataFrame(
        [(1000 + i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, v array<double>",
    )
    with pytest.raises(Exception, match="centroid selection is empty"):
        ivf_topk(vecs, F.col("vec_id") < 1002, k=2, nlist=4).collect()


def test_ivf_pq_probe_side_dim_check_with_code_table(spark):
    # r13 review finding: with code_table= the corpus encode (and its
    # dim assert) never runs, so a wrong-dim probe table silently
    # slice-truncated into plausible-but-wrong LUTs.
    from pandas_sigproc_spark.operators import ann

    from pyspark.sql import functions as F

    dim = 8
    vecs = spark.createDataFrame(
        [(i, [float((i * j) % 5) + 1.0 for j in range(dim)]) for i in range(32)],
        "vec_id long, v array<double>",
    )
    m, ksub, nlist = 2, 4, 4
    codes = ann.pq_code_table(vecs, m=m, ksub=ksub, nlist=nlist, dim=dim)
    wrong = spark.createDataFrame(
        [(i, [1.0] * (dim + 2)) for i in range(32)],
        "vec_id long, v array<double>",
    )
    with pytest.raises(Exception, match="vector length"):
        ann.ivf_pq_topk(
            wrong, F.col("vec_id") < 4, k=2, m=m, ksub=ksub,
            nlist=nlist, dim=dim, code_table=codes,
        ).collect()
