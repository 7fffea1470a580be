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

Layout under ``<path>/`` (store version 2)::

    _meta.json                    # {version, ngram, batches, next_batch}
    digests/batch=<id>/*.parquet  # (doc_id long, digest string)
    bands/batch=<id>/*.parquet    # (doc_id long, digest string,
                                  #  sig array<long>, band int, key long)

``bands`` carries the digest and full signature alongside each band key
so a probe (batch or streaming) is self-contained after ONE equi-join
on (band, key) — no second join back to a signature table in the hot
path.  Storage cost at the defaults: 4 band rows x (8B sig component
x 8 + digest 32B + keys) ~ 150 B/doc — ~1.5 TB of store per 10^10
documents, vs re-deriving signatures from 100 TB of text per screen.

Durability contract: every write lands in its OWN ``batch=<id>``
partition directory, and ``_meta.json`` lists the COMMITTED batch ids.
Readers filter to the committed list (partition pruning makes the
filter free), so a crash between the digests append and the bands
append — or anywhere before the meta stamp — leaves orphan files that
no probe will ever see, instead of a torn store whose exact and near
tiers disagree.  The meta stamp itself goes through
write-tmp/delete/rename; a crash inside that tiny window leaves a store
with no ``_meta.json``, which appends and reads refuse loudly.

All filesystem access (meta stamps, existence checks, batch GC) goes
through the Hadoop FileSystem API of the path's own scheme, so the
store works unchanged on hdfs:// and s3a:// paths, not just the local
disk Spark tests run on.

Equality contract (pinned by tests/test_sigstore.py): screening a
delta against the store — freshly built, parquet-roundtripped,
assembled by appends, or compacted — returns the EXACT frame
``incremental_dedup`` returns against the corpus text, because both
feed the same probe core (``curation._incremental_dedup_core``) and
the stored values are the same integer/string columns the inline path
derives.

Scale notes: writes repartition ``bands`` by (band, key) and
``digests`` by digest so files are size-balanced under skewless md5
keys; the probe joins shuffle on those same keys.  ``ngram`` is baked
into the stored signatures: probing with a different ``ngram`` than
the store was built with is a contract violation the probe cannot
detect (signatures are just longs), so ``_meta.json`` records it and
both append and probe refuse a mismatch.
"""

from __future__ import annotations

import json
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import curation as _cur

_STORE_VERSION = 2


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
    signature folds — the same expressions the inline probe uses).

    NULL text coalesces to '' before hashing (the batch core's rule —
    curation._incremental_dedup_core: every document gets a digest, so
    a store built over a corpus with NULL-text rows stays comparable
    with inline probes).  The band-key arithmetic is
    ``curation._band_keys`` itself, not a copy — stored keys and
    stream/batch-derived keys cannot drift."""
    d = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.coalesce(F.col(text_col), F.lit("")).alias("text"),
    )
    digests = d.select("doc_id", F.md5("text").alias("digest"))
    sig = d.select(
        "doc_id",
        F.md5("text").alias("digest"),
        _cur.minhash_sig_expr("text", ngram).alias("sig"),
    )
    bands = _cur._band_keys(
        sig, "doc_id", extra=(("digest", "digest"),)
    ).select(
        "doc_id", "digest", F.col("sig_doc_id").alias("sig"), "band", "key"
    )
    return SignatureStore(digests, bands, ngram)


# ---------------------------------------------------------------------------
# Hadoop-FS plumbing: the store must work on hdfs:// / s3a:// paths, so
# every non-parquet filesystem touch goes through the path's own
# FileSystem instead of os/shutil (which silently no-op or corrupt on
# remote schemes).
# ---------------------------------------------------------------------------


def _jfs(spark: SparkSession, path: str):
    """(FileSystem, Path-class) for ``path``'s scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jvm.org.apache.hadoop.fs.Path


def _fs_exists(spark: SparkSession, path: str) -> bool:
    fs, P = _jfs(spark, path)
    return bool(fs.exists(P(path)))


def _fs_delete(spark: SparkSession, path: str) -> None:
    fs, P = _jfs(spark, path)
    fs.delete(P(path), True)


def _fs_read_text(spark: SparkSession, path: str) -> str:
    fs, P = _jfs(spark, path)
    stream = fs.open(P(path))
    try:
        # py4j passes byte[] by value, so stream.read(buf) can't fill a
        # Python buffer; commons-io (a hard Spark dependency) drains the
        # stream JVM-side and returns the bytes.  Meta files are tens of
        # bytes.
        data = spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        return bytes(data).decode("utf-8")
    finally:
        stream.close()


def _fs_write_text_atomic(spark: SparkSession, path: str, text: str) -> None:
    """Write ``text`` to ``path`` via tmp + delete + rename.  The only
    non-atomic window is between the delete and the rename; a crash
    there leaves NO file at ``path``, which readers treat as a crashed
    write and refuse loudly — never a half-written stamp."""
    fs, P = _jfs(spark, path)
    tmp = path + ".tmp"
    stream = fs.create(P(tmp), True)
    try:
        stream.write(bytearray(text, "utf-8"))
    finally:
        stream.close()
    if fs.exists(P(path)):
        fs.delete(P(path), False)
    if not fs.rename(P(tmp), P(path)):
        raise IOError(f"rename {tmp} -> {path} failed")


def _meta_path(path: str) -> str:
    return path.rstrip("/") + "/_meta.json"


def _read_meta(spark: SparkSession, path: str) -> dict:
    meta_path = _meta_path(path)
    if not _fs_exists(spark, meta_path):
        raise ValueError(
            f"signature store at {path} has no _meta.json — either it"
            " was never written or a prior write crashed before the"
            " meta stamp. Rebuild with mode='overwrite' instead of"
            " reading/appending an unverifiable store."
        )
    meta = json.loads(_fs_read_text(spark, meta_path))
    if meta.get("version") != _STORE_VERSION:
        raise ValueError(
            f"signature store at {path} has version {meta.get('version')};"
            f" this engine reads version {_STORE_VERSION} stores. Rebuild"
            " with write_signature_store(mode='overwrite')."
        )
    return meta


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    _fs_write_text_atomic(spark, _meta_path(path), json.dumps(meta))


def _write_batch(
    store: SignatureStore, path: str, batch_id: int, n: int
) -> None:
    """Write both tables into their ``batch=<id>`` partition dirs
    (Hive-style: the batch value lives in the directory name, exactly
    what ``partitionBy`` would produce, so partition discovery reads it
    back).  Not a commit: the batch becomes visible only when the
    caller stamps it into meta's committed list afterwards.  Overwrite
    semantics on the batch dir are safe — a dir that exists at a
    never-committed id is debris from a crashed write."""
    base = path.rstrip("/")
    # bands first — the ONE corpus scan (md5 + minhash fold).  The
    # digest table then derives from the just-written bands parquet
    # (~150 B/doc; every doc's band-0 row carries its digest) instead
    # of executing a second independent scan of the corpus text (a
    # review finding: the old two-plan write recomputed the corpus md5
    # per table, contradicting the "one scan" contract).  Crash-safe:
    # the batch is invisible until the caller's meta stamp commits it.
    bands_dir = f"{base}/bands/batch={batch_id}"
    store.bands.repartition(n, "band", "key").write.mode("overwrite").parquet(
        bands_dir
    )
    spark = store.bands.sparkSession
    (
        spark.read.parquet(bands_dir)
        .filter(F.col("band") == 0)
        .select("doc_id", "digest")
        .repartition(n, "digest")
        .write.mode("overwrite")
        .parquet(f"{base}/digests/batch={batch_id}")
    )


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
    for any corpus id space).  Appends are atomic at batch granularity:
    the new batch directory is invisible to probes until both tables
    landed and the meta stamp committed it."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = docs.sparkSession
    if mode == "append":
        meta = _read_meta(spark, path)
        if meta["ngram"] != ngram:
            raise ValueError(
                f"signature store at {path} was built with ngram="
                f"{meta['ngram']}; appending ngram={ngram} signatures"
                " would silently corrupt every later probe"
            )
    else:
        if _fs_exists(spark, path):
            _fs_delete(spark, path)
        meta = {
            "version": _STORE_VERSION,
            "ngram": ngram,
            "batches": [],
            "next_batch": 0,
        }
    store = signature_tables(docs, id_col=id_col, text_col=text_col, ngram=ngram)
    n = partitions or spark.sparkContext.defaultParallelism
    batch_id = int(meta["next_batch"])
    _write_batch(store, path, batch_id, n)
    meta["batches"] = sorted(set(meta["batches"]) | {batch_id})
    meta["next_batch"] = batch_id + 1
    _write_meta(spark, path, meta)


def read_signature_store(spark: SparkSession, path: str) -> SignatureStore:
    """Open a store written by :func:`write_signature_store`.  Only
    COMMITTED batches are visible: the ``batch`` partition filter prunes
    any directory a crashed write left behind."""
    meta = _read_meta(spark, path)
    base = path.rstrip("/")
    committed = [int(b) for b in meta["batches"]]

    def _read(tbl: str) -> DataFrame:
        return (
            spark.read.parquet(f"{base}/{tbl}")
            .where(F.col("batch").isin(committed))
            .drop("batch")
        )

    return SignatureStore(_read("digests"), _read("bands"), int(meta["ngram"]))


def compact_signature_store(
    spark: SparkSession, path: str, *, partitions: int | None = None
) -> None:
    """Rewrite the store's append-accumulated small files into
    ``partitions`` balanced files per table (values unchanged — probes
    before and after return identical frames; pinned by
    tests/test_sigstore.py).  Each append writes its own batch
    directory, so a store that has admitted many small batches
    accumulates far more files than bytes; periodic compaction restores
    scan parallelism without touching corpus text.

    Crash-safe by the batch-commit protocol: the compacted copy lands
    in a NEW batch directory, the meta stamp atomically swaps the
    committed list to just that batch, and only then is every batch
    directory OUTSIDE the new committed list garbage-collected — not
    merely the batches committed at entry, so orphans leaked by an
    earlier crash (between a meta stamp and its GC loop) are swept on
    the next compaction rather than listed forever.  A crash at any
    point leaves a valid store (possibly with orphan directories that
    readers prune and the next compaction removes).  Probes planned BEFORE the swap may still
    hold file handles into the old batches, so treat this as offline
    maintenance or layer a transactional table format's compaction on
    top for concurrent readers."""
    meta = _read_meta(spark, path)
    store = read_signature_store(spark, path)
    n = partitions or spark.sparkContext.defaultParallelism
    batch_id = int(meta["next_batch"])
    base = path.rstrip("/")
    # Stage into a hidden sibling (Spark's file listing skips dot-dirs),
    # then RENAME into place as the new batch dir: the compacted copy is
    # derived from the directories it replaces, so it must never be
    # written into the tree the read plan is still listing.
    tmp = f"{base}/.compact_tmp"
    if _fs_exists(spark, tmp):
        _fs_delete(spark, tmp)
    store.digests.repartition(n, "digest").write.parquet(f"{tmp}/digests")
    store.bands.repartition(n, "band", "key").write.parquet(f"{tmp}/bands")
    fs, P = _jfs(spark, path)
    for tbl in ("digests", "bands"):
        dst = f"{base}/{tbl}/batch={batch_id}"
        if fs.exists(P(dst)):  # debris from a crashed compaction
            fs.delete(P(dst), True)
        if not fs.rename(P(f"{tmp}/{tbl}"), P(dst)):
            raise IOError(f"rename {tmp}/{tbl} -> {dst} failed")
    _fs_delete(spark, tmp)
    meta["batches"] = [batch_id]
    meta["next_batch"] = batch_id + 1
    _write_meta(spark, path, meta)  # the commit point
    # GC: sweep EVERY batch dir outside the new committed list — not
    # just the batches committed at entry — so orphans from a crash
    # between a previous meta stamp and its GC loop (batch ids are
    # never reused, so they would otherwise leak forever and stay in
    # every scan's listing) are reclaimed here.
    for tbl in ("digests", "bands"):
        tbl_dir = f"{base}/{tbl}"
        if not fs.exists(P(tbl_dir)):
            continue
        for st in fs.listStatus(P(tbl_dir)):
            name = st.getPath().getName()
            if name.startswith("batch=") and name != f"batch={batch_id}":
                fs.delete(st.getPath(), True)


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


# ---------------------------------------------------------------------------
# Media hash stores — the SAME batch-commit protocol for the image and
# audio dedup tiers (r9 verdict #7): the materializable derived form of
# each modality is already a compact hash table (pHash: 8 B/image;
# audio fp: ~hundreds of 8 B hashes/clip), so the store holds ONE
# table, ``hashes/batch=<id>/``, under the identical committed-list
# meta, torn-append invisibility, crash-safe compaction, and
# orphan-sweeping GC as the text signature store.  ``kind`` is baked
# into the meta exactly like ``ngram``: probing an audio store with
# image hashes is a contract violation the longs cannot reveal, so
# reads and appends refuse a mismatch loudly.
#
# Banding is NOT stored (unlike the text tier's band table): the
# Hamming band keys are cheap JVM bit expressions over the 8-byte
# hashes and depend on the probe-time ``max_hamming``, whereas text
# band keys derive from full corpus text — the expensive pass media
# stores skip is the decode+hash, which the hash table already
# amortizes.
# ---------------------------------------------------------------------------


def _read_media_meta(spark: SparkSession, path: str, kind: str) -> dict:
    meta_path = _meta_path(path)
    if not _fs_exists(spark, meta_path):
        raise ValueError(
            f"media hash store at {path} has no _meta.json — either it"
            " was never written or a prior write crashed before the"
            " meta stamp. Rebuild with mode='overwrite' instead of"
            " reading/appending an unverifiable store."
        )
    meta = json.loads(_fs_read_text(spark, meta_path))
    if meta.get("version") != _STORE_VERSION:
        raise ValueError(
            f"media hash store at {path} has version"
            f" {meta.get('version')}; this build reads version"
            f" {_STORE_VERSION} — rebuild or migrate"
        )
    if meta.get("kind") != kind:
        raise ValueError(
            f"media hash store at {path} holds kind={meta.get('kind')!r};"
            f" asked for kind={kind!r} — hashes of different modalities"
            " are not comparable (the longs cannot reveal the mismatch)"
        )
    return meta


def write_media_hash_store(
    hashes: DataFrame,
    path: str,
    *,
    kind: str,
    hash_col: str,
    mode: str = "overwrite",
    partitions: int | None = None,
) -> None:
    """Write/append a ``(media_id, <hash_col>)`` hash table as a
    committed batch (``kind``: e.g. ``"phash"`` or ``"audio_fp"``;
    recorded in meta and enforced on every later read/append).  Same
    atomicity as :func:`write_signature_store`: the batch directory is
    invisible until the meta stamp commits it."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    if hash_col not in hashes.columns:
        raise ValueError(f"hashes has no column {hash_col!r}: {hashes.columns}")
    spark = hashes.sparkSession
    if mode == "append":
        meta = _read_media_meta(spark, path, kind)
    else:
        if _fs_exists(spark, path):
            _fs_delete(spark, path)
        meta = {
            "version": _STORE_VERSION,
            "kind": kind,
            "batches": [],
            "next_batch": 0,
        }
    n = partitions or spark.sparkContext.defaultParallelism
    batch_id = int(meta["next_batch"])
    base = path.rstrip("/")
    hashes.repartition(n, hash_col).write.mode("overwrite").parquet(
        f"{base}/hashes/batch={batch_id}"
    )
    meta["batches"] = sorted(set(meta["batches"]) | {batch_id})
    meta["next_batch"] = batch_id + 1
    _write_meta(spark, path, meta)


def read_media_hash_store(
    spark: SparkSession, path: str, *, kind: str
) -> DataFrame:
    """Open a store written by :func:`write_media_hash_store` — only
    COMMITTED batches are visible (partition pruning makes the filter
    free)."""
    meta = _read_media_meta(spark, path, kind)
    committed = [int(b) for b in meta["batches"]]
    return (
        spark.read.parquet(f"{path.rstrip('/')}/hashes")
        .where(F.col("batch").isin(committed))
        .drop("batch")
    )


def compact_media_hash_store(
    spark: SparkSession,
    path: str,
    *,
    kind: str,
    partitions: int | None = None,
    key_col: str | None = None,
) -> None:
    """:func:`compact_signature_store` for a media hash store: rewrite
    the append-accumulated batch dirs into one balanced batch, swap the
    committed list atomically, then sweep EVERY batch dir outside the
    new committed list (orphans from earlier crashes included).

    ``key_col`` names the repartition key explicitly; when ``None`` the
    2-column media layout's hash column is inferred (whichever column
    isn't ``media_id``).  Callers with wider tables (the PQ code store)
    MUST pass it — positional inference over a 3-column table was a
    review finding: it picked ``vec_id`` only by select order, and a
    schema evolution would have silently repartitioned on the codes
    array."""
    meta = _read_media_meta(spark, path, kind)
    store = read_media_hash_store(spark, path, kind=kind)
    if key_col is not None:
        if key_col not in store.columns:
            raise ValueError(
                f"compact: key_col {key_col!r} not in store columns"
                f" {store.columns}"
            )
        hash_col = key_col
    else:
        others = [c for c in store.columns if c != "media_id"]
        if "media_id" not in store.columns or len(others) != 1:
            raise ValueError(
                "compact: cannot infer the repartition key for columns"
                f" {store.columns} — pass key_col explicitly"
            )
        hash_col = others[0]
    n = partitions or spark.sparkContext.defaultParallelism
    batch_id = int(meta["next_batch"])
    base = path.rstrip("/")
    tmp = f"{base}/.compact_tmp"
    if _fs_exists(spark, tmp):
        _fs_delete(spark, tmp)
    store.repartition(n, hash_col).write.parquet(f"{tmp}/hashes")
    fs, P = _jfs(spark, path)
    dst = f"{base}/hashes/batch={batch_id}"
    if fs.exists(P(dst)):  # debris from a crashed compaction
        fs.delete(P(dst), True)
    if not fs.rename(P(f"{tmp}/hashes"), P(dst)):
        raise IOError(f"rename {tmp}/hashes -> {dst} failed")
    _fs_delete(spark, tmp)
    meta["batches"] = [batch_id]
    meta["next_batch"] = batch_id + 1
    _write_meta(spark, path, meta)  # the commit point
    tbl_dir = f"{base}/hashes"
    for st in fs.listStatus(P(tbl_dir)):
        name = st.getPath().getName()
        if name.startswith("batch=") and name != f"batch={batch_id}":
            fs.delete(st.getPath(), True)


# ---------------------------------------------------------------------------
# PQ code store — the materialized one-time-per-corpus IVF-PQ encode
# (ann.pq_code_table: (vec_id, codes[m], list_id)), stored under the
# SAME batch-commit protocol as the media hash stores.  The kind string
# bakes in (m, ksub, nlist): probing codes produced under different PQ
# parameters is the modality-mismatch analog (the ints cannot reveal
# it), so the existing kind-equality check enforces parameter equality
# for free.  Codebook PROVENANCE (which rows / trained codebook seeded
# the quantizers) is the caller's contract: pair a store with the same
# codebook/centroid source its encode used, exactly as a FAISS index
# file pairs with its trained quantizers.
# ---------------------------------------------------------------------------


def pq_store_kind(*, m: int, ksub: int, nlist: int) -> str:
    return f"pq_codes:m={int(m)}:ksub={int(ksub)}:nlist={int(nlist)}"


def write_pq_code_store(
    codes: DataFrame,
    path: str,
    *,
    m: int,
    ksub: int,
    nlist: int,
    mode: str = "overwrite",
    partitions: int | None = None,
) -> None:
    """Write/append a ``(vec_id, codes, list_id)`` table (the
    ``ann.pq_code_table`` output) as a committed batch.  Same
    atomicity as the media hash stores; ``append`` is the daily-delta
    path (new vectors encoded against the SAME quantizers)."""
    want = {"vec_id", "codes", "list_id"}
    if not want.issubset(codes.columns):
        raise ValueError(
            f"PQ code table needs columns {sorted(want)}; got {codes.columns}"
        )
    write_media_hash_store(
        codes.select("vec_id", "codes", "list_id"),
        path,
        kind=pq_store_kind(m=m, ksub=ksub, nlist=nlist),
        hash_col="vec_id",
        mode=mode,
        partitions=partitions,
    )


def read_pq_code_store(
    spark: SparkSession, path: str, *, m: int, ksub: int, nlist: int
) -> DataFrame:
    """Open a PQ code store — only committed batches are visible, and
    a (m, ksub, nlist) mismatch refuses loudly via the kind check."""
    return read_media_hash_store(
        spark, path, kind=pq_store_kind(m=m, ksub=ksub, nlist=nlist)
    )


def compact_pq_code_store(
    spark: SparkSession,
    path: str,
    *,
    m: int,
    ksub: int,
    nlist: int,
    partitions: int | None = None,
) -> None:
    """Rewrite append-accumulated batch dirs into one balanced batch
    (crash-safe, orphan-sweeping — the media-store compaction)."""
    compact_media_hash_store(
        spark,
        path,
        kind=pq_store_kind(m=m, ksub=ksub, nlist=nlist),
        partitions=partitions,
        key_col="vec_id",
    )


__all__ = [
    "SignatureStore",
    "signature_tables",
    "write_signature_store",
    "read_signature_store",
    "compact_signature_store",
    "incremental_dedup_from_store",
    "write_media_hash_store",
    "read_media_hash_store",
    "compact_media_hash_store",
    "write_pq_code_store",
    "read_pq_code_store",
    "compact_pq_code_store",
    "pq_store_kind",
]
