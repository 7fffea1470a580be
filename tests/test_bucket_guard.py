"""Hot-bucket guard for banded-LSH pair joins (dedup.guard_bucket_rows).

SKEW.md's degenerate-bucket probe (1,500 duplicate vectors in one LSH
bucket -> 1.13M candidate pairs in ONE task, 5.0x wall) motivated a
default-on cap mirroring semantic_dedup's max_cluster_rows: any task
reading a row of an over-cap bucket raises loudly with the
exact-dedup-first remediation instead of silently grinding.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from pandas_sigproc_spark.operators.curation import incremental_dedup
from pandas_sigproc_spark.operators.dedup import guard_bucket_rows


def _keys(spark, sizes):
    """A (t, bucket, vec_id) key table with given per-bucket row counts."""
    rows = []
    vid = 0
    for b, n in enumerate(sizes):
        for _ in range(n):
            rows.append((0, b, vid))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["t", "bucket", "vec_id"])
    return spark.createDataFrame(pdf, "t int, bucket int, vec_id long")


def test_guard_fires_on_hot_bucket(spark):
    df = guard_bucket_rows(
        _keys(spark, [5, 40, 5]),
        ["t", "bucket"],
        guarded_col="vec_id",
        max_bucket_rows=10,
        op_name="probe",
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    msg = str(ei.value)
    assert "max_bucket_rows=10" in msg
    assert "exact/hash dedup FIRST" in msg
    assert "bucket=1" in msg


def test_guard_passes_healthy_buckets(spark):
    df = guard_bucket_rows(
        _keys(spark, [5, 8, 5]),
        ["t", "bucket"],
        guarded_col="vec_id",
        max_bucket_rows=10,
    )
    assert df.count() == 18
    # values untouched when under cap
    assert sorted(r.vec_id for r in df.collect()) == list(range(18))


def test_guard_opt_out(spark):
    df = guard_bucket_rows(
        _keys(spark, [5, 40, 5]),
        ["t", "bucket"],
        guarded_col="vec_id",
        max_bucket_rows=None,
    )
    assert df.count() == 50  # no guard, no raise


def test_guard_bad_cap_raises(spark):
    with pytest.raises(ValueError):
        guard_bucket_rows(
            _keys(spark, [1]), ["t", "bucket"], guarded_col="vec_id",
            max_bucket_rows=0,
        )


def _corpus(spark, texts, start=0):
    pdf = pd.DataFrame(
        {"doc_id": range(start, start + len(texts)), "text": texts}
    )
    return spark.createDataFrame(pdf, "doc_id long, text string")


def test_incremental_dedup_guard_fires_on_degenerate_band(spark):
    # 60 copies of the same text -> every band key is shared by all 60
    dup = "the same boilerplate text repeated across the whole batch ok"
    delta = _corpus(spark, [dup] * 60)
    existing = _corpus(spark, ["something else entirely here now"], start=1000)
    out = incremental_dedup(existing, delta, max_bucket_rows=20)
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "incremental_dedup" in str(ei.value)
    assert "exact/hash dedup FIRST" in str(ei.value)


def test_incremental_dedup_results_unchanged_by_guard(spark):
    texts = [f"unique document number {i} with its own words {i * 7}" for i in range(20)]
    delta = _corpus(spark, texts)
    existing = _corpus(spark, texts[:5], start=1000)
    guarded = incremental_dedup(existing, delta).toPandas()
    unguarded = incremental_dedup(
        existing, delta, max_bucket_rows=None
    ).toPandas()
    pd.testing.assert_frame_equal(
        guarded.sort_values("doc_id", ignore_index=True),
        unguarded.sort_values("doc_id", ignore_index=True),
    )
