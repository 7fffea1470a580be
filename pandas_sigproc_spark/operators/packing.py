"""Greedy sequence packing: fit documents into fixed token-budget packs.

The packing stage of an LLM pretraining data pipeline (no reference-repo
counterpart — engine extension per SURVEY.md §7.2 phase 6, held to the
same oracle gates as the other LLM-pipeline operators).

Semantics: within each group (e.g. ``(lang, shard)``) documents are taken
in ``order_col`` order and appended to the current pack; a document whose
tokens would push the pack past ``budget`` starts a new pack.  The first
document of a pack always joins it, so an oversized document gets a pack
of its own.  Integer arithmetic end to end — deterministic and
oracle-exact (DuckDB mirrors it with a recursive CTE).

Scale shape: packing is inherently sequential *within* one pack stream,
so streams are co-located by repartitioning on ``group_cols``, ordered
by ``sortWithinPartitions``, and packed by ONE ``mapInPandas`` pass per
partition whose generator carries the running pack state across Arrow
batches (r11: replaces per-group ``applyInPandas``, whose per-group
Python call overhead serialized under AQE partition coalescing — the
bench scale leg measured the pack stage at 11x wall on 8x data; the
partition kernel brought the seq_pack scale ratio from 4.1 to 1.4).
In production the shard key bounds group size (real pipelines pack per
worker shard), so a group never outgrows a task; everything upstream
(token counting, shard assignment) is map-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType


def pack_sequences(
    df: DataFrame,
    budget: int,
    *,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    group_cols: Sequence[str] = ("lang", "shard"),
) -> DataFrame:
    """Assign each row a ``(pack_id, pack_pos)`` within its group.

    ``pack_id`` is 0-based per group; ``pack_pos`` is the row's 0-based
    position inside its pack.  Rows are packed greedily in ``order_col``
    order under the token ``budget``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    gcols = list(group_cols)
    keep = gcols + [order_col, tokens_col]
    fields = [df.schema[c] for c in keep]
    schema = StructType(
        fields
        + [
            StructField("pack_id", IntegerType(), nullable=False),
            StructField("pack_pos", IntegerType(), nullable=False),
        ]
    )

    # PARTITION-level kernel, not per-group applyInPandas (r11): with
    # many small groups, applyInPandas pays one Python call + Arrow
    # batch per GROUP, and AQE coalesces a small shuffle into few
    # post-shuffle partitions, serializing those calls — the bench
    # scale leg measured the pack stage at 11x wall on 8x data purely
    # from per-group call overhead (0.34s -> 3.70s).  Instead:
    # repartition on the group key (co-locates each group),
    # sortWithinPartitions((group, order)) — then ONE mapInPandas pass
    # whose generator carries (group key, pack, pos, run) across Arrow
    # batches, so a group split across batch boundaries packs
    # correctly.  Per-group work is identical; per-group call overhead
    # is gone (measured 4.92s -> ~1.6s for the x8 seq_pack leg).
    def kernel(batches):
        import pandas as pd

        _SENTINEL = object()  # distinct from any real key incl. None

        def norm(v):
            # Arrow->pandas renders a NULL numeric group key as NaN,
            # and NaN != NaN would restart the pack stream on EVERY
            # null-key row — map all nulls to None so they compare
            # equal, matching the one-group-per-NULL semantics the
            # repartition/sort upstream already gives them.
            return None if pd.isna(v) else v

        cur_key, pack, pos, run = _SENTINEL, 0, 0, 0
        for pdf in batches:
            pdf = pdf[keep]
            pack_ids, positions = [], []
            gvals = [pdf[c].to_numpy() for c in gcols]
            toks = pdf[tokens_col].to_numpy()
            for i in range(len(pdf)):
                key = tuple(norm(g[i]) for g in gvals)
                if key != cur_key:
                    cur_key, pack, pos, run = key, 0, 0, 0
                t = int(toks[i])
                if pos > 0 and run + t > budget:
                    pack, pos, run = pack + 1, 0, 0
                pack_ids.append(pack)
                positions.append(pos)
                run += t
                pos += 1
            out = pdf.copy()
            out["pack_id"] = pd.array(pack_ids, dtype="int32")
            out["pack_pos"] = pd.array(positions, dtype="int32")
            yield out

    return (
        df.select(*keep)
        .repartition(*gcols)
        .sortWithinPartitions(*gcols, order_col)
        .mapInPandas(kernel, schema)
    )


_ORDER_BUCKET_TARGET_ROWS = 1 << 22  # ~4M (id, hash) rows per bucket task


def _derive_order_buckets(n_rows: int) -> int:
    """Bucket count for :func:`training_order` when the caller doesn't
    pass one: the next power of two that keeps per-bucket ``row_number``
    tasks at or under ``_ORDER_BUCKET_TARGET_ROWS`` rows (~4M rows of
    (id, 32-char hash) ≈ 250 MB task input — comfortably inside an
    executor), floored at 256 so tiny corpora keep the historical
    bucket granularity, and capped at 2**24 (16.7M buckets × 4M rows
    covers ~7e13 ids — far past any real corpus).  Power-of-two counts
    keep the leading-hash-bits range split exact at every width."""
    b = 256
    while b < (1 << 24) and n_rows > b * _ORDER_BUCKET_TARGET_ROWS:
        b *= 2
    return b


def training_order(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    seed: str = "epoch0",
    buckets: int | None = None,
) -> DataFrame:
    """Deterministic global training order — the reproducible corpus
    shuffle every trainer needs (data order changes loss curves; a
    re-run, a resume, or a differently-sized cluster must see the SAME
    sequence).  Each row gets an exact 0-based ``global_pos`` in the
    order of a salted md5 over its id: RNG-free, seed-parameterized
    (one seed per epoch gives independent epoch permutations), and —
    because the hash decorrelates from ingest order — sources arrive
    interleaved rather than in corpus-concatenation order.

    Scale shape — exact global enumeration with NO global sort: the
    order key's leading bits bucket rows uniformly; ``row_number``
    runs per bucket (one shuffle, ~corpus/``buckets`` rows per task);
    bucket counts fold to ``buckets`` rows whose prefix sum runs in a
    window bounded by the bucket count and broadcast-joins back (the
    assign_shards distributed-prefix-sum shape).  The global-sort
    alternative funnels the corpus through one range exchange; this
    plan never materializes a total order anywhere.

    ``buckets=None`` (the default) SIZES THE SPLIT FROM THE CORPUS: a
    count pre-pass picks the next power of two that bounds each bucket
    task at ~4M rows (see :func:`_derive_order_buckets`) — the
    r11-era fixed default of 256 put corpus/256 rows through each
    ``row_number`` task, which at 10^11 ids is a ~400M-row window
    task.  The pre-pass counts only the pruned id column — one cheap
    scan when ``df`` is a stored table, but it EXECUTES THE UPSTREAM
    LINEAGE: if ``df`` is the tail of an expensive derived plan,
    persist it first or pass ``buckets`` explicitly (a plan with no
    pre-pass; the oracle-pinned gates fix 256 this way).  Bucket VALUES for a given ``buckets <= 65536`` are
    unchanged from earlier releases (the 16-bit prefix split); larger
    counts split on the leading 32 bits, which a 16-bit prefix cannot
    resolve.

    Output: ``(id_col long, bucket int, global_pos long)`` where
    ``global_pos`` is exactly ``rank of md5(seed:id)`` with ``id`` as
    the tiebreak (md5 collisions included).  Rows with a NULL id are
    DROPPED up front (a null id has no hash and no place in a
    permutation — silently half-counting them in the offsets while the
    bucket join discarded them was a review finding; dropping on both
    paths keeps the output an exact 0-based permutation of the non-null
    ids, the connected_components half-edge rule).
    """
    if buckets is None:
        n_rows = df.select(F.col(id_col)).filter(
            F.col(id_col).isNotNull()
        ).count()
        buckets = _derive_order_buckets(n_rows)
        # Surface the derived count: bucket VALUES depend on it, so a
        # rerun that must reproduce a persisted (bucket, global_pos)
        # output needs to pin buckets=<this> explicitly (ADVICE r12 —
        # above ~1G rows the derived default diverges from the old
        # fixed 256).
        import logging

        logging.getLogger(__name__).info(
            "training_order: derived buckets=%d from %d ids — pass "
            "buckets=%d explicitly to reproduce this split on a rerun",
            buckets, n_rows, buckets,
        )
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    from pyspark.sql import Window

    # Column API, not an f-string expr: a seed containing a quote must
    # be a literal, never expression text (review finding).
    ok = F.md5(
        F.concat(
            F.lit(seed), F.lit(":"), F.col(id_col).cast("string")
        )
    )
    # prefix width: 16 hash bits resolve up to 65536 buckets (and keep
    # bucket values identical to earlier releases); wider counts read
    # 32 bits.  Power-of-two counts divide either range exactly.
    width, span = (4, 65536) if buckets <= 65536 else (8, 1 << 32)
    base = df.select(
        F.col(id_col).cast("long").alias("_id"), ok.alias("_ok")
    ).filter(F.col("_id").isNotNull()).select(
        "_id",
        "_ok",
        # leading bits of the SAME hash that defines the order,
        # RANGE-split (not modulo — a modulo would break monotonicity)
        # so bucket is monotone in _ok and (bucket, _ok) ordering ==
        # _ok ordering: lowercase-hex sorts lexicographically exactly
        # as its nibbles sort numerically.
        F.expr(
            f"cast(cast(conv(substring(_ok, 1, {width}), 16, 10) as"
            f" bigint) * {int(buckets)} div {span} as int)"
        ).alias("bucket"),
    )
    wi = Window.partitionBy("bucket").orderBy("_ok", "_id")
    intra = base.withColumn("_rn", F.row_number().over(wi))
    totals = base.groupBy("bucket").agg(F.count("*").alias("_n"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "bucket", (F.sum("_n").over(wb) - F.col("_n")).alias("_off")
    )
    return (
        intra.join(F.broadcast(offsets), "bucket")
        .select(
            F.col("_id").alias(id_col),
            "bucket",
            (F.col("_off") + F.col("_rn") - 1).cast("long").alias(
                "global_pos"
            ),
        )
    )


def assign_shards(
    df: DataFrame,
    shard_tokens: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    buckets: int = 1024,
) -> DataFrame:
    """Deterministic token-balanced shard assignment — the step UPSTREAM
    of :func:`pack_sequences` that derives the shard key itself: lay the
    corpus out in a fixed pseudo-random order and cut it every
    ``shard_tokens`` tokens, so every shard (except the last) carries
    the same token budget regardless of document-length skew.

    Order: ``(bucket, id)`` where ``bucket = md5(id) % buckets`` — a
    deterministic shuffle, so adjacent input documents land in different
    shards (the usual de-clustering trainers want) and re-runs produce
    identical ids on any cluster layout.  ``shard = global_start div
    shard_tokens`` where ``global_start`` is the exact token prefix sum
    before the document.  Integer arithmetic end to end.

    Scale shape — a DISTRIBUTED PREFIX SUM, no global sort anywhere:
    the intra-bucket cumulative sum is a window partitioned by the
    uniform md5 bucket key (one shuffle, ~corpus/buckets rows per
    task); bucket totals aggregate to ``buckets`` rows whose own prefix
    sum runs in a single-partition window BOUNDED BY THE CONSTANT
    ``buckets`` (never by the corpus) and broadcast-joins back.  The
    global-sort alternative (one ORDER BY + unbounded window) funnels
    the whole corpus through a range exchange and serializes the
    running sum in one task — this plan touches each row twice,
    map-side both times.

    Output: ``(id_col long, bucket int, n_tokens long,
    global_start long, shard long)``.
    """
    if shard_tokens <= 0:
        raise ValueError(f"shard_tokens must be positive, got {shard_tokens}")
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    from pyspark.sql import Window

    b = F.expr(
        f"cast(conv(substring(md5(cast({id_col} as string)), 1, 15),"
        f" 16, 10) as bigint) % {int(buckets)}"
    ).cast("int")
    base = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(tokens_col).cast("long").alias("_tok"),
        b.alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = base.withColumn(
        "_intra_end", F.sum("_tok").over(w)
    )
    totals = base.groupBy("bucket").agg(F.sum("_tok").alias("_btok"))
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "bucket",
        (F.sum("_btok").over(wb) - F.col("_btok")).alias("_boff"),
    )
    out = intra.join(F.broadcast(offsets), "bucket")
    start = F.col("_boff") + F.col("_intra_end") - F.col("_tok")
    return out.select(
        F.col("_id").alias(id_col),
        "bucket",
        F.col("_tok").alias("n_tokens"),
        start.cast("long").alias("global_start"),
    ).withColumn(
        # integer `div`, not floor(double division): long/long in Spark
        # is double arithmetic, and past ~2^52 the rounded quotient can
        # cross an integer boundary — diverging from the oracle's exact
        # `//` and breaking the "integer arithmetic end to end" contract
        "shard",
        F.expr(f"global_start div {int(shard_tokens)}").cast("long"),
    )
