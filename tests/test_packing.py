"""Greedy sequence packing (operators/packing.py) semantics.

Engine extension (no reference counterpart): the packing stage of a
training-data pipeline.  Pinned here: budget enforcement, oversized-doc
isolation, order/position bookkeeping, and partition-invariance (the
driver-gate oracle replays the same recurrence as a recursive CTE in
DuckDB — see __spark_entry__.SQL_SEQ_PACK).
"""

import hashlib

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.packing import assign_shards, pack_sequences


def _pack_df(spark, rows, budget, npartitions=None):
    pdf = pd.DataFrame(rows, columns=["lang", "shard", "doc_id", "n_tokens"])
    df = spark.createDataFrame(pdf, "lang string, shard long, doc_id long, n_tokens int")
    if npartitions:
        df = df.repartition(npartitions)
    out = pack_sequences(df, budget)
    return (
        out.toPandas()
        .sort_values(["lang", "shard", "doc_id"], ignore_index=True)
    )


def test_budget_respected_and_positions(spark):
    rows = [("en", 0, i, 60) for i in range(10)]  # 4 docs of 60 fit in 256
    out = _pack_df(spark, rows, 256)
    # packs of 4, 4, 2
    assert list(out["pack_id"]) == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    assert list(out["pack_pos"]) == [0, 1, 2, 3, 0, 1, 2, 3, 0, 1]
    sums = out.groupby("pack_id")["n_tokens"].sum()
    assert (sums <= 256).all()


def test_oversized_doc_gets_own_pack(spark):
    rows = [("en", 0, 0, 100), ("en", 0, 1, 999), ("en", 0, 2, 100), ("en", 0, 3, 100)]
    out = _pack_df(spark, rows, 256)
    assert list(out["pack_id"]) == [0, 1, 2, 2]
    assert list(out["pack_pos"]) == [0, 0, 0, 1]


def test_groups_pack_independently(spark):
    rows = [("en", 0, 0, 200), ("en", 1, 1, 200), ("de", 0, 2, 200), ("en", 0, 4, 200)]
    out = _pack_df(spark, rows, 256)
    by = out.set_index("doc_id")
    # each group starts at pack 0; the second en/0 doc overflows into pack 1
    assert by.loc[0, "pack_id"] == 0 and by.loc[4, "pack_id"] == 1
    assert by.loc[1, "pack_id"] == 0 and by.loc[2, "pack_id"] == 0


def test_partition_invariance(spark):
    rows = [("en", i % 3, i, 30 + (i * 37) % 90) for i in range(60)]
    a = _pack_df(spark, rows, 128, npartitions=1)
    b = _pack_df(spark, rows, 128, npartitions=7)
    pd.testing.assert_frame_equal(a, b)


def test_bad_budget_raises(spark):
    with pytest.raises(ValueError):
        pack_sequences(
            spark.createDataFrame([("en", 0, 0, 1)], "lang string, shard long, doc_id long, n_tokens int"),
            0,
        )


# --- assign_shards: token-balanced sharding ---------------------------------


def _shards_df(spark, tokens, shard_tokens, *, buckets=8, npartitions=None):
    pdf = pd.DataFrame(
        {"doc_id": range(len(tokens)), "n_tokens": tokens}
    )
    df = spark.createDataFrame(pdf, "doc_id long, n_tokens long")
    if npartitions:
        df = df.repartition(npartitions)
    out = assign_shards(df, shard_tokens, buckets=buckets)
    return out.toPandas().sort_values("doc_id", ignore_index=True)


def _replay_shards(tokens, shard_tokens, buckets):
    """Pure-python replay of the documented contract: lay docs out in
    (bucket, id) order, bucket = md5 60-bit % buckets; global_start =
    exact token prefix sum; shard = global_start div shard_tokens."""
    def bucket(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % buckets

    order = sorted(range(len(tokens)), key=lambda i: (bucket(i), i))
    rows, start = {}, 0
    for i in order:
        rows[i] = (bucket(i), tokens[i], start, start // shard_tokens)
        start += tokens[i]
    return rows


def test_assign_shards_contract_columns(spark):
    out = _shards_df(spark, [10, 20, 30], 32)
    assert list(out.columns) == ["doc_id", "bucket", "n_tokens", "global_start", "shard"]
    assert str(out["shard"].dtype) == "int64"
    assert str(out["global_start"].dtype) == "int64"


def test_assign_shards_matches_replay(spark):
    tokens = [7 + (i * 13) % 40 for i in range(80)]
    out = _shards_df(spark, tokens, 64, buckets=8)
    replay = _replay_shards(tokens, 64, 8)
    for _, r in out.iterrows():
        b, tok, start, shard = replay[int(r["doc_id"])]
        assert int(r["bucket"]) == b
        assert int(r["n_tokens"]) == tok
        assert int(r["global_start"]) == start, f"doc {r['doc_id']}"
        assert int(r["shard"]) == shard, f"doc {r['doc_id']}"


def test_assign_shards_partition_invariance(spark):
    tokens = [5 + (i * 29) % 90 for i in range(120)]
    a = _shards_df(spark, tokens, 128, npartitions=1)
    b = _shards_df(spark, tokens, 128, npartitions=11)
    pd.testing.assert_frame_equal(a, b)


def test_assign_shards_token_balance(spark):
    # every shard except the last carries (shard_tokens - max_doc, shard_tokens]
    # tokens of STARTS — the cut points land inside documents, so a shard's
    # total is within one document of the budget
    tokens = [11 + (i * 17) % 50 for i in range(200)]
    out = _shards_df(spark, tokens, 256)
    sums = out.groupby("shard")["n_tokens"].sum()
    full = sums.iloc[:-1]
    assert (full >= 256 - max(tokens) + 1).all()
    assert (full <= 256 + max(tokens) - 1).all()


def test_assign_shards_feeds_pack_sequences(spark):
    # composition: the derived shard key is a valid pack_sequences group
    tokens = [9 + (i * 23) % 70 for i in range(100)]
    pdf = pd.DataFrame({"doc_id": range(len(tokens)), "n_tokens": tokens})
    df = spark.createDataFrame(pdf, "doc_id long, n_tokens long")
    sharded = assign_shards(df, 512, buckets=8)
    packed = pack_sequences(
        sharded, 128, tokens_col="n_tokens", order_col="global_start",
        group_cols=("shard",),
    ).toPandas()
    assert len(packed) == len(tokens)
    sums = packed.groupby(["shard", "pack_id"]).agg(
        n=("global_start", "size"), tot=("n_tokens", "sum")
    )
    for _, r in sums.iterrows():
        assert r["tot"] <= 128 or r["n"] == 1


def test_assign_shards_bad_args_raise(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        assign_shards(df, 0)
    with pytest.raises(ValueError):
        assign_shards(df, 10, buckets=0)


# --- hypothesis properties -------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=60),
    budget=st.integers(min_value=50, max_value=400),
)
def test_greedy_invariants(spark, tokens, budget):
    rows = [("en", 0, i, t) for i, t in enumerate(tokens)]
    out = _pack_df(spark, rows, budget)
    # order preserved: pack ids nondecreasing in doc order, positions
    # restart at 0 exactly at pack boundaries
    packs = list(out["pack_id"])
    poss = list(out["pack_pos"])
    assert packs == sorted(packs)
    for i in range(1, len(packs)):
        if packs[i] == packs[i - 1]:
            assert poss[i] == poss[i - 1] + 1
        else:
            assert packs[i] == packs[i - 1] + 1 and poss[i] == 0
    # budget respected except single-doc packs (oversized isolation)
    sums = out.groupby("pack_id").agg(n=("doc_id", "size"), tot=("n_tokens", "sum"))
    for _, r in sums.iterrows():
        assert r["tot"] <= budget or r["n"] == 1
    # greedy maximality: the first doc of pack p+1 did NOT fit in pack p
    firsts = out[out["pack_pos"] == 0].sort_values("pack_id")
    for k in range(1, len(firsts)):
        prev_tot = sums.loc[firsts.iloc[k - 1]["pack_id"], "tot"]
        assert prev_tot + firsts.iloc[k]["n_tokens"] > budget


# --- round-11 review-finding regressions -------------------------------------


def test_pack_sequences_null_group_key_is_one_stream(spark):
    # Arrow renders a NULL numeric group key as NaN; NaN != NaN must NOT
    # restart the pack stream per row (review finding) — NULL keys pack
    # greedily as one group, like groupBy would treat them.
    import pandas as pd

    from pandas_sigproc_spark.operators.packing import pack_sequences

    pdf = pd.DataFrame(
        {
            "lang": ["en"] * 6,
            "shard": pd.array([None] * 6, dtype="Int64"),
            "doc_id": range(6),
            "n_tokens": [4] * 6,
        }
    )
    df = spark.createDataFrame(
        pdf, "lang string, shard long, doc_id long, n_tokens long"
    )
    out = (
        pack_sequences(df, budget=8, group_cols=("lang", "shard"))
        .orderBy("doc_id")
        .collect()
    )
    # budget 8, 4 tokens each -> packs of 2: [0,0,1,1,2,2]
    assert [r["pack_id"] for r in out] == [0, 0, 1, 1, 2, 2]
    assert [r["pack_pos"] for r in out] == [0, 1, 0, 1, 0, 1]


def test_training_order_null_ids_dropped_cleanly(spark):
    # NULL ids are excluded up front — output stays an exact 0-based
    # permutation of the non-null ids (review finding: they used to be
    # dropped by the join but still counted in the bucket offsets).
    import pandas as pd

    from pandas_sigproc_spark.operators.packing import training_order

    pdf = pd.DataFrame({"doc_id": pd.array([0, 1, None, 2, None], dtype="Int64")})
    df = spark.createDataFrame(pdf, "doc_id long")
    out = training_order(df).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]
    assert sorted(r["global_pos"] for r in out) == [0, 1, 2]


def test_training_order_seed_with_quote_is_a_literal(spark):
    # the seed is a literal, never expression text (review finding)
    import pandas as pd

    from pandas_sigproc_spark.operators.packing import training_order

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(10)}))
    out = training_order(df, seed="epoch'0; drop--").collect()
    assert sorted(r["global_pos"] for r in out) == list(range(10))
