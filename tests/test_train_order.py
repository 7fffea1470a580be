"""training_order (operators/packing.py) — deterministic global
training order with no global sort — and cluster_representatives
(operators/curation.py) — quality-argmax keeper per near-dup cluster.
"""

import hashlib

import pandas as pd

from pandas_sigproc_spark.operators.curation import cluster_representatives
from pandas_sigproc_spark.operators.packing import training_order


def _expected_order(ids, seed):
    keyed = sorted(
        (hashlib.md5(f"{seed}:{i}".encode()).hexdigest(), i) for i in ids
    )
    return {i: pos for pos, (_, i) in enumerate(keyed)}


def test_matches_hash_rank_exactly(spark):
    ids = list(range(500))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    got = {
        r["doc_id"]: r["global_pos"]
        for r in training_order(df, seed="epoch0").collect()
    }
    assert got == _expected_order(ids, "epoch0")


def test_positions_are_a_permutation(spark):
    ids = list(range(0, 3000, 3))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    pos = [r["global_pos"] for r in training_order(df).collect()]
    assert sorted(pos) == list(range(len(ids)))


def test_partitioning_invariance(spark):
    ids = list(range(400))
    outs = []
    for parts in (1, 13, 32):
        df = spark.createDataFrame(pd.DataFrame({"doc_id": ids})).repartition(
            parts
        )
        outs.append(
            sorted(
                (r["doc_id"], r["global_pos"])
                for r in training_order(df, buckets=32).collect()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_seed_changes_order(spark):
    ids = list(range(300))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    a = {r["doc_id"]: r["global_pos"] for r in training_order(df, seed="e0").collect()}
    b = {r["doc_id"]: r["global_pos"] for r in training_order(df, seed="e1").collect()}
    assert a != b
    assert a == _expected_order(ids, "e0")
    assert b == _expected_order(ids, "e1")


def test_bucket_count_does_not_change_order(spark):
    ids = list(range(350))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    a = {r["doc_id"]: r["global_pos"] for r in training_order(df, buckets=8).collect()}
    b = {r["doc_id"]: r["global_pos"] for r in training_order(df, buckets=4096).collect()}
    assert a == b


def test_derived_bucket_sizing_rule():
    # r11 verdict #6: the fixed default of 256 buckets put corpus/256
    # rows through one row_number task at scale.  Pin the sizing rule:
    # power-of-two, floor 256, ~4M rows per bucket task, cap 2**24.
    from pandas_sigproc_spark.operators.packing import (
        _ORDER_BUCKET_TARGET_ROWS,
        _derive_order_buckets,
    )

    assert _ORDER_BUCKET_TARGET_ROWS == 1 << 22
    assert _derive_order_buckets(0) == 256
    assert _derive_order_buckets(10_000) == 256
    assert _derive_order_buckets(256 * (1 << 22)) == 256
    assert _derive_order_buckets(256 * (1 << 22) + 1) == 512
    # 10^11 ids (the verdict's 100 TB figure): ~400M rows/task at 256
    # buckets; the rule derives 32768 -> ~3.1M rows/task
    assert _derive_order_buckets(10**11) == 32768
    assert _derive_order_buckets(10**11) * _ORDER_BUCKET_TARGET_ROWS >= 10**11
    assert _derive_order_buckets(10**30) == 1 << 24  # cap


def test_default_buckets_derive_from_count(spark):
    # small corpus -> derived 256 -> byte-identical to the historical
    # fixed default (the oracle-pinned gates pass 256 explicitly)
    ids = list(range(300))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    a = {
        r["doc_id"]: (r["bucket"], r["global_pos"])
        for r in training_order(df).collect()
    }
    b = {
        r["doc_id"]: (r["bucket"], r["global_pos"])
        for r in training_order(df, buckets=256).collect()
    }
    assert a == b


def test_wide_bucket_split_preserves_order(spark):
    # buckets > 65536 switch the range split to the leading 32 hash
    # bits; the permutation must be the same order the 16-bit split
    # (and the brute-force hash rank) defines.
    ids = list(range(400))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    got = {
        r["doc_id"]: r["global_pos"]
        for r in training_order(df, seed="e0", buckets=1 << 17).collect()
    }
    assert got == _expected_order(ids, "e0")


# --- cluster_representatives -------------------------------------------------


def _cc_df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["doc_id", "component"])
    )


def test_cluster_rep_argmax_and_ties(spark):
    # cluster 0: docs 0,1,2 — doc 1 has top score -> rep.
    # cluster 3: docs 3,4 tie on score -> smaller id (3) wins.
    # doc 5: singleton -> kept.
    comp = _cc_df(
        spark, [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5)]
    )
    scores = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1, 2, 3, 4, 5], "score": [0.2, 0.9, 0.5, 0.7, 0.7, 0.1]}
        )
    )
    rows = {r["doc_id"]: r for r in cluster_representatives(comp, scores).collect()}
    assert rows[0]["rep_doc_id"] == 1 and rows[0]["kept"] is False
    assert rows[1]["rep_doc_id"] == 1 and rows[1]["kept"] is True
    assert rows[2]["rep_doc_id"] == 1 and rows[2]["kept"] is False
    assert rows[3]["rep_doc_id"] == 3 and rows[3]["kept"] is True
    assert rows[4]["rep_doc_id"] == 3 and rows[4]["kept"] is False
    assert rows[5]["rep_doc_id"] == 5 and rows[5]["kept"] is True


def test_cluster_rep_one_kept_per_cluster(spark):
    import random

    rng = random.Random(7)
    comp_rows = []
    score_rows = []
    for d in range(200):
        comp_rows.append((d, d % 17))  # 17 clusters
        score_rows.append((d, round(rng.random(), 6)))
    out = cluster_representatives(
        _cc_df(spark, comp_rows),
        spark.createDataFrame(pd.DataFrame(score_rows, columns=["doc_id", "score"])),
    ).collect()
    kept_per = {}
    for r in out:
        kept_per.setdefault(r["component"], 0)
        kept_per[r["component"]] += int(r["kept"])
        assert (r["doc_id"] == r["rep_doc_id"]) == r["kept"]
    assert all(v == 1 for v in kept_per.values())
    assert len(out) == 200


def test_cluster_rep_missing_scores_still_classified(spark):
    # docs absent from the scores table must stay in the output (left
    # join, -inf competition): they never beat a scored member, and an
    # all-unscored cluster falls back to the min-id keeper.
    comp = _cc_df(spark, [(0, 0), (1, 0), (5, 5), (6, 5)])
    scores = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "score": [0.4]})
    )
    rows = {r["doc_id"]: r for r in cluster_representatives(comp, scores).collect()}
    assert set(rows) == {0, 1, 5, 6}  # nothing dropped
    assert rows[0]["kept"] is True and rows[1]["kept"] is False
    assert rows[1]["score"] is None
    # all-unscored cluster: min id (5) keeps
    assert rows[5]["kept"] is True and rows[6]["kept"] is False
