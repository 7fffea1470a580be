"""Materialized signature store — the production substrate of
incremental ingestion dedup.

``incremental_dedup`` (curation.py) and ``streaming_incremental_dedup``
(streaming/) both document the same 100 TB contract: the existing
corpus is touched ONLY through two compact derived tables — a digest
table and an LSH band-key table, dozens of bytes per document — that
"a production deployment would keep materialized and incrementally
appended".  This module IS that deployment piece: build the tables
once, write them as parquet, append each admitted crawl batch, and run
every later screen off the store without ever rescanning corpus text.

Layout under ``<path>/``::

    digests/   (doc_id long, digest string)
    bands/     (doc_id long, digest string, sig array<long>,
                band int, key long)          # n_bands rows per doc

``bands`` carries the digest and full signature alongside each band key
so a probe (batch or streaming) is self-contained after ONE equi-join
on (band, key) — no second join back to a signature table in the hot
path.  Storage cost at the defaults: 4 band rows x (8B sig component
x 8 + digest 32B + keys) ~ 150 B/doc — ~1.5 TB of store per 10^10
documents, vs re-deriving signatures from 100 TB of text per screen.

Equality contract (pinned by tests/test_sigstore.py): screening a
delta against the store — freshly built, parquet-roundtripped, or
assembled by appends — returns the EXACT frame ``incremental_dedup``
returns against the corpus text, because both feed the same probe core
(``curation._incremental_dedup_core``) and the stored values are the
same integer/string columns the inline path derives.

Scale notes: writes repartition ``bands`` by (band, key) and
``digests`` by digest so files are size-balanced under skewless md5
keys; the probe joins shuffle on those same keys.  Appends are plain
parquet appends — no compaction logic here; deployments layer their
table format's clustering/compaction on top.  ``ngram`` is baked into
the stored signatures: probing with a different ``ngram`` than the
store was built with is a contract violation the probe cannot detect
(signatures are just longs), so the store writes a ``_meta.json``
recording it and ``read_signature_store`` refuses a mismatched probe.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import curation as _cur


class SignatureStore(NamedTuple):
    digests: DataFrame  # (doc_id long, digest string)
    bands: DataFrame  # (doc_id long, digest string, sig array<long>, band int, key long)
    ngram: int


def signature_tables(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
) -> SignatureStore:
    """Derive the store tables from corpus text (one scan, map-side
    signature folds — the same expressions the inline probe uses)."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    digests = d.select("doc_id", F.md5("text").alias("digest"))
    sig = d.select(
        "doc_id",
        F.md5("text").alias("digest"),
        _cur.minhash_sig_expr("text", ngram).alias("sig"),
    )
    n_bands = len(_cur.INCR_MINHASH_PERMS) // _cur.INCR_BAND_ROWS
    p = _cur.INCR_MINHASH_P
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.col("sig")[2 * b] * F.lit(p) + F.col("sig")[2 * b + 1]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select(
        "doc_id", "digest", "sig", F.explode(bands_arr).alias("bk")
    ).select("doc_id", "digest", "sig", "bk.band", "bk.key")
    return SignatureStore(digests, bands, ngram)


def write_signature_store(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    mode: str = "overwrite",
    partitions: int | None = None,
) -> None:
    """Build the signature tables from ``docs`` and write them under
    ``path`` (``mode="append"`` adds a new ingestion batch — the caller
    guarantees batch doc_ids are disjoint from the store's, exactly as
    for any corpus id space)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    store = signature_tables(docs, id_col=id_col, text_col=text_col, ngram=ngram)
    meta_path = os.path.join(path, "_meta.json")
    if mode == "append":
        # A store with tables but no _meta.json is a crashed write (meta
        # lands last) — appending blind could mix ngram spaces, the exact
        # silent corruption _meta.json exists to refuse.
        if not os.path.exists(meta_path):
            raise ValueError(
                f"signature store at {path} has no _meta.json — either it"
                " was never written or a prior write crashed before the"
                " meta stamp. Rebuild with mode='overwrite' instead of"
                " appending into an unverifiable store."
            )
        with open(meta_path) as fh:
            meta = json.load(fh)
        if meta["ngram"] != ngram:
            raise ValueError(
                f"signature store at {path} was built with ngram="
                f"{meta['ngram']}; appending ngram={ngram} signatures"
                " would silently corrupt every later probe"
            )
    n = partitions or docs.sparkSession.sparkContext.defaultParallelism
    store.digests.repartition(n, "digest").write.mode(mode).parquet(
        os.path.join(path, "digests")
    )
    store.bands.repartition(n, "band", "key").write.mode(mode).parquet(
        os.path.join(path, "bands")
    )
    os.makedirs(path, exist_ok=True)
    with open(meta_path, "w") as fh:
        json.dump({"ngram": ngram, "version": 1}, fh)


def read_signature_store(spark: SparkSession, path: str) -> SignatureStore:
    """Open a store written by :func:`write_signature_store`."""
    meta_path = os.path.join(path, "_meta.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    return SignatureStore(
        spark.read.parquet(os.path.join(path, "digests")),
        spark.read.parquet(os.path.join(path, "bands")),
        int(meta["ngram"]),
    )


def compact_signature_store(
    spark: SparkSession, path: str, *, partitions: int | None = None
) -> None:
    """Rewrite the store's append-accumulated small files into
    ``partitions`` balanced files per table (values unchanged — probes
    before and after return identical frames; pinned by
    tests/test_sigstore.py).  Each append writes its own file set, so a
    store that has admitted many small batches accumulates far more
    files than bytes; periodic compaction restores scan parallelism
    without touching corpus text.

    OFFLINE maintenance: the rewrite stages into a sibling directory and
    swaps with remove+rename — not atomic, so do not run concurrently
    with probes (deployments on a transactional table format use its
    native compaction instead)."""
    import shutil

    n = partitions or spark.sparkContext.defaultParallelism
    store = read_signature_store(spark, path)
    tmp = path + ".compacting"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    store.digests.repartition(n, "digest").write.parquet(
        os.path.join(tmp, "digests")
    )
    store.bands.repartition(n, "band", "key").write.parquet(
        os.path.join(tmp, "bands")
    )
    for tbl in ("digests", "bands"):
        shutil.rmtree(os.path.join(path, tbl))
        os.rename(os.path.join(tmp, tbl), os.path.join(path, tbl))
    shutil.rmtree(tmp, ignore_errors=True)


def incremental_dedup_from_store(
    store: SignatureStore,
    delta: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_threshold: float = 0.5,
    ngram: int | None = None,
    max_bucket_rows: int | None = 100_000,
) -> DataFrame:
    """:func:`curation.incremental_dedup` with the corpus side read from
    the materialized store — same output contract, same probe core,
    corpus text never scanned.  ``ngram`` defaults to the store's own
    (passing a different value raises: the stored signatures ARE the
    ngram choice)."""
    if not 0.0 < near_threshold <= 1.0:
        raise ValueError("need 0 < near_threshold <= 1")
    if ngram is None:
        ngram = store.ngram
    elif ngram != store.ngram:
        raise ValueError(
            f"store was built with ngram={store.ngram}, probe asked for"
            f" ngram={ngram} — signatures would not be comparable"
        )
    d = delta.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    ex_digests = store.digests.select("digest").distinct()
    ex_bk = store.bands.select(
        F.col("doc_id").alias("e_id"),
        F.col("sig").alias("sig_e_id"),
        "band",
        "key",
    )
    return _cur._incremental_dedup_core(
        d,
        ex_digests,
        ex_bk,
        near_threshold=near_threshold,
        ngram=ngram,
        max_bucket_rows=max_bucket_rows,
    )


__all__ = [
    "SignatureStore",
    "signature_tables",
    "write_signature_store",
    "read_signature_store",
    "compact_signature_store",
    "incremental_dedup_from_store",
]
