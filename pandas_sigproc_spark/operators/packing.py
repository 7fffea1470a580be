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
so the stream is keyed by ``group_cols`` and runs as one applyInPandas
group.  In production the shard key bounds group size (real pipelines
pack per worker shard), so a group never outgrows a task; everything
upstream (token counting, shard assignment) is map-side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
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

    def kernel(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort")[keep]
        pack_ids, positions = [], []
        pack, pos, run = 0, 0, 0
        for tok in pdf[tokens_col]:
            t = int(tok)
            if pos > 0 and run + t > budget:
                pack, pos, run = pack + 1, 0, 0
            pack_ids.append(pack)
            positions.append(pos)
            run += t
            pos += 1
        out = pdf.copy()
        out["pack_id"] = pd.array(pack_ids, dtype="int32")
        out["pack_pos"] = pd.array(positions, dtype="int32")
        return out

    return df.groupBy(*gcols).applyInPandas(kernel, schema)
