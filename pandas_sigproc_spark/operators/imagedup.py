"""Perceptual-hash image deduplication — near-dup detection over binary
image columns (the multimodal counterpart of the embedding/minhash dedup
tiers; the LAION-style image-dedup stage of a training pipeline).

pHash (the classic DCT perceptual hash): decode the payload with the
engine's own codecs (BMP/PNG/JPEG — operators/multimodal.py seam),
grayscale, nearest-resize to 32x32, 2D DCT (the same orthonormal 8x8
basis generalized to 32), keep the top-left 8x8 low-frequency block
minus the DC term, threshold each coefficient against their median →
one 64-bit signature per image.  Hashes survive exactly the transforms
that matter for dedup: JPEG recompression, mild resizing, and brightness
scaling perturb few bits, while unrelated images differ in ~32
(pinned in tests/test_imagedup.py).

Distributed shape (the part that must survive 100 TB):

- ``phash_images``: ONE zero-shuffle ``mapInPandas`` pass — payload
  bytes in, (media_id, phash BIGINT) out.  8 bytes per image leave the
  decode stage; payloads never shuffle.
- ``phash_near_pairs``: banded Hamming self-join on the 8-byte hashes.
  The 64-bit hash splits into ``max_hamming + 1`` bit-bands; by
  pigeonhole, any pair within the Hamming radius agrees EXACTLY on at
  least one whole band, so candidates come from equi-joins on
  (band_id, band_bits) — never an all-pairs scan — and are verified
  with one ``bit_count(a XOR b)`` expression.  This is the same
  OR-of-bands LSH shape as the MinHash and embedding tiers, specialized
  to Hamming space where banding is EXACT (no false negatives at all,
  not just probabilistic recall).  The verify is JVM-side integer ops;
  no Python anywhere after the hash pass.  The same hot-bucket guard as
  the embedding tier applies (a band value shared by millions of
  near-identical images — run exact dedup first).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .dedup import guard_bucket_rows

PHASH_SIZE = 32  # resize target feeding the DCT
PHASH_BITS = 64  # 8x8 low-frequency block minus DC, median-thresholded

_DCT32 = None


def _dct32() -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        n = PHASH_SIZE
        t = np.zeros((n, n))
        for u in range(n):
            c = np.sqrt(1.0 / n) if u == 0 else np.sqrt(2.0 / n)
            t[u] = c * np.cos((2 * np.arange(n) + 1) * u * np.pi / (2 * n))
        _DCT32 = t
    return _DCT32


def phash_bytes(payload: bytes) -> int:
    """The 64-bit perceptual hash of one encoded image payload."""
    from .multimodal import _decode_image

    return phash_pixels(_decode_image(bytes(payload)))


def phash_pixels(px: np.ndarray) -> int:
    """The 64-bit perceptual hash of a decoded (h, w, 3) pixel array —
    the payload-free entry for containers whose frames decode straight
    to pixels (GIF animations)."""
    px = np.asarray(px).astype(np.float64)
    gray = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    from pandas_sigproc_spark.sources.bmp import resize_nearest

    small = resize_nearest(
        np.repeat(
            np.clip(np.round(gray), 0, 255).astype(np.uint8)[:, :, None],
            3,
            axis=2,
        ),
        PHASH_SIZE,
        PHASH_SIZE,
    )[:, :, 0].astype(np.float64)
    t = _dct32()
    coef = t @ small @ t.T
    # round-3 before the median/compare: the DuckDB oracle replays this
    # DCT with ordered LIST_SUM folds whose last-ulp summation order
    # differs from BLAS matmul (~1e-9 absolute on O(10^3) coefs); after
    # both engines round to 1e-3 the values are identical unless an
    # unrounded coef sits within drift of a rounding boundary — the
    # margin audit in tests/test_imagedup.py measures that distance per
    # gate dataset.  (The median is an ORDER STATISTIC of the block, so
    # its own bit is 0 by identity in both engines regardless.)
    block = np.round(coef[:8, :8].reshape(-1)[1:], 3)  # [1:] drops DC
    med = np.median(block)
    bits = block > med
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    # 63 comparison bits (the 8x8 block minus DC), so h < 2^63 always:
    # it fits a signed Spark LongType directly, bit 63 is a constant 0
    # (the top Hamming band carries one fewer discriminating bit than
    # its width suggests — a review finding corrected this comment; the
    # old two's-complement fold-down was dead code)
    return h


def phash_images(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(media_id long, phash long) via one zero-shuffle mapInPandas pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "phash": [
                        phash_bytes(bytes(p)) for p in pdf[payload_col]
                    ],
                }
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, "media_id long, phash long"
    )


def phash_band_keys(
    h: DataFrame,
    max_hamming: int,
    *,
    max_bucket_rows: int | None = 100_000,
    op_name: str = "phash_band_keys",
) -> DataFrame:
    """Explode a ``(media_id, phash)`` table into the exact Hamming
    band keys: ``(media_id, phash, band_id, band_bits)`` with
    ``max_hamming + 1`` bands per hash.  By pigeonhole, any pair within
    the Hamming radius agrees EXACTLY on at least one whole band, so
    equi-joining on (band_id, band_bits) loses no true pair.  The
    hot-bucket guard (``max_bucket_rows``) is default-on — the band
    split depends on the probe-time radius, so the keys are derived
    here per probe rather than materialized (the stored form is the
    8-byte hash itself; see sigstore.write_media_hash_store)."""
    n_bands = max_hamming + 1
    width = PHASH_BITS // n_bands
    rem = PHASH_BITS - width * n_bands  # last band absorbs the remainder

    def band_bits(col, bi: int):
        off = bi * width
        w = width + (rem if bi == n_bands - 1 else 0)
        # logical (unsigned) shift so the sign bit cannot smear: Spark
        # longs are signed, shiftright is arithmetic — mask AFTER a
        # shiftrightunsigned instead
        shifted = F.shiftrightunsigned(col, off)
        if w >= 64:
            # max_hamming=0 (exact-dup radius): ONE full-width band —
            # F.lit(2^64 - 1) overflows LongType with a
            # NumberFormatException (a review finding); the whole hash
            # IS the band, no mask needed
            return shifted
        return shifted.bitwiseAND(F.lit((1 << w) - 1))

    bands = h.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(*[band_bits(F.col("phash"), bi) for bi in range(n_bands)])
        ).alias("band_id", "band_bits"),
    )
    if max_bucket_rows is not None:
        bands = guard_bucket_rows(
            bands,
            ["band_id", "band_bits"],
            guarded_col="band_bits",
            max_bucket_rows=max_bucket_rows,
            op_name=op_name,
        )
    return bands


def phash_near_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hashes: DataFrame | None = None,
    max_bucket_rows: int | None = 100_000,
    pair_pred=None,
) -> DataFrame:
    """All image pairs (m1 < m2) whose pHashes differ in at most
    ``max_hamming`` of 64 bits.  EXACT: banding in Hamming space loses
    no true pair (pigeonhole over ``max_hamming + 1`` bands).

    Output: ``(m1, m2, hamming int)``.  ``hashes`` short-circuits the
    decode pass with a precomputed (media_id, phash) table — the
    materialized-signature-store pattern.  ``max_bucket_rows`` is the
    embedding tier's hot-bucket guard on the band join.  ``pair_pred``
    is an extra join predicate over the ``a``/``b`` aliases, applied
    INSIDE the equi-join so excluded pairs are pruned before they
    materialize (video_near_pairs drops same-video pairs this way — a
    long static video otherwise fans out O(frames^2) candidate rows
    that all get discarded, a review finding).
    """
    if not 0 <= max_hamming < PHASH_BITS:
        raise ValueError(f"need 0 <= max_hamming < {PHASH_BITS}")
    h = hashes if hashes is not None else phash_images(
        media, id_col=id_col, payload_col=payload_col
    )
    bands = phash_band_keys(
        h,
        max_hamming,
        max_bucket_rows=max_bucket_rows,
        op_name="phash_near_pairs",
    )
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    )
    cond = (
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.band_bits") == F.col("b.band_bits"))
        & (F.col("a.media_id") < F.col("b.media_id"))
    )
    if pair_pred is not None:
        cond = cond & pair_pred
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.media_id").alias("m1"),
            F.col("b.media_id").alias("m2"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("m1", "m2")  # pairs co-bucketing in several bands
        .agg(F.max("hamming").alias("hamming"))
    )
    return cand.select("m1", "m2", F.col("hamming").cast("int").alias("hamming"))


def phash_frames(
    media: DataFrame,
    every_n: int = 1,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-sampled-frame perceptual hashes of video payloads (real MP4
    via the ISO BMFF demuxer, or the BMPV toy container):
    ``(media_id long, frame_idx int, phash long)`` — one zero-shuffle
    mapInPandas pass, ``every_n``-th frame kept (frame sampling and
    hashing fused so unsampled frames are never hashed).

    Video near-dup composes from here relationally: join two videos'
    frame-hash tables on frame_idx (aligned cuts) or via
    :func:`phash_near_pairs` over the frame rows (shot-level matching)
    — both stay in the exact banded-Hamming machinery.
    """
    if every_n < 1:
        raise ValueError("need every_n >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pandas_sigproc_spark.sources.bmp import decode_bmpv
        from pandas_sigproc_spark.sources.gif import decode_gif, is_gif_bytes
        from pandas_sigproc_spark.sources.mp4 import decode_mp4, is_mp4_bytes

        for pdf in batches:
            ids, idxs, hs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                if is_gif_bytes(raw):
                    # GIF frames decode straight to composited pixels
                    frames = decode_gif(raw)
                    hash_one = phash_pixels
                else:
                    frames = (
                        decode_mp4(raw).samples
                        if is_mp4_bytes(raw)
                        else decode_bmpv(raw)
                    )
                    hash_one = phash_bytes
                for fi in range(0, len(frames), every_n):
                    ids.append(int(mid))
                    idxs.append(fi)
                    hs.append(hash_one(frames[fi]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "phash": hs}
            )

    return media.select(id_col, payload_col).mapInPandas(
        run, "media_id long, frame_idx int, phash long"
    )


def video_near_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    *,
    every_n: int = 1,
    max_frames: int = 1 << 20,
    id_col: str = "media_id",
    payload_col: str = "payload",
    frame_hashes: DataFrame | None = None,
    max_bucket_rows: int | None = 100_000,
) -> DataFrame:
    """Video near-duplicate pairs by frame-level perceptual hashing:
    ``(v1, v2, n_frame_pairs long, best_hamming int)`` for every
    cross-video pair with at least one frame pair within
    ``max_hamming`` — the composition :func:`phash_frames` documents,
    packaged: sample+hash frames (one zero-shuffle mapInPandas pass, 8
    bytes per frame), join frames of DIFFERENT videos through the
    EXACT banded Hamming machinery of :func:`phash_near_pairs` (via a
    composite ``media_id * max_frames + frame_idx`` key — banding over
    composite keys is still pigeonhole-exact because the band bits
    come from the hash, not the key), and roll up to video-level
    evidence: ``n_frame_pairs`` matched frame pairs, ``best_hamming``
    the closest.  ``every_n`` thins dense videos (frame sampling and
    hashing are fused); ``frame_hashes`` short-circuits the decode
    with a precomputed (media_id, frame_idx, phash) table — the media
    hash store pattern.

    Scale shape: identical to the image pair join — band keys are int
    expressions over the 8-byte frame hashes, the hot-bucket guard is
    default-on, the roll-up groups on already-joined keys.  The
    caller persists ``frame_hashes`` when feeding this twice (the
    driver's gate query does).
    """
    if every_n < 1:
        raise ValueError("need every_n >= 1")
    fr = (
        frame_hashes
        if frame_hashes is not None
        else phash_frames(
            media, every_n, id_col=id_col, payload_col=payload_col
        )
    )
    # Composite-key safety: a frame index at or above max_frames would
    # silently land the key in the NEXT video's key space (wrong-video
    # pair verdicts, no error) — refuse loudly instead.  frame_idx is
    # the RAW index (every_n thins which frames are hashed, not the
    # numbering), so size max_frames to the longest video's raw frame
    # count.
    bad = F.raise_error(
        F.concat(
            F.lit("video_near_pairs: frame_idx "),
            F.col("frame_idx").cast("string"),
            F.lit(
                f" >= max_frames={max_frames} — composite keys would"
                " collide across videos; raise max_frames above the"
                " longest video's raw frame count"
            ),
        )
    ).cast("long")
    # media_id must be in [0, 2^62/max_frames): negative ids split one
    # video's frames across TWO composite keys (truncating DIV: frame 0
    # of video -1 keys to v=-1, frame 5 to v=0 — its own frames then
    # pass the v1 != v2 filter as a bogus cross-video pair), and huge
    # ids overflow the multiply (a review finding; same silent-wrong-
    # verdict class as the frame_idx guard above).
    bad_id = F.raise_error(
        F.concat(
            F.lit("video_near_pairs: media_id "),
            F.col("media_id").cast("string"),
            F.lit(
                f" outside [0, {(1 << 62) // max_frames}) — the"
                f" media_id*{max_frames}+frame_idx composite key would"
                " wrap or interleave across videos; remap ids (e.g."
                " pmod of a hash) first"
            ),
        )
    ).cast("long")
    id_ok = (F.col("media_id") >= 0) & (
        F.col("media_id") < (1 << 62) // max_frames
    )
    keyed = fr.select(
        F.when(
            ~id_ok,
            bad_id,
        )
        .when(
            F.col("frame_idx") < max_frames,
            F.col("media_id") * max_frames + F.col("frame_idx"),
        )
        .otherwise(bad)
        .alias("media_id"),
        "phash",
    )
    pairs = phash_near_pairs(
        media,
        max_hamming,
        hashes=keyed,
        max_bucket_rows=max_bucket_rows,
        # prune same-video pairs INSIDE the band join: a static 50k-
        # frame video otherwise emits ~1.2e9 all-discarded candidate
        # rows and can trip the hot-bucket guard with a remediation
        # that cannot apply (a review finding)
        pair_pred=F.expr(
            f"(a.media_id DIV {max_frames}) != (b.media_id DIV {max_frames})"
        ),
    )
    return (
        pairs.select(
            F.expr(f"m1 DIV {max_frames}").alias("v1"),
            F.expr(f"m2 DIV {max_frames}").alias("v2"),
            "hamming",
        )
        .filter(F.col("v1") != F.col("v2"))
        .groupBy("v1", "v2")
        .agg(
            F.count("*").cast("long").alias("n_frame_pairs"),
            F.min("hamming").cast("int").alias("best_hamming"),
        )
    )


def phash_dedup(
    media: DataFrame,
    max_hamming: int = 3,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_bucket_rows: int | None = 100_000,
    persist=None,
) -> DataFrame:
    """Keep/drop verdict per image: an image is dropped when a
    LOWER-id image sits within the Hamming radius (the same keep-first
    rule as the text dedup tiers).  Output: ``(media_id, phash, keep)``.

    ``persist`` (callable df -> df, or True): cache the decoded hash
    table — it feeds both band-join sides AND the final keep join, so
    unpersisted the expensive decode+pHash Python pass runs ~3x (a
    review finding; the incremental sibling exposes the same seam).
    """
    h = phash_images(media, id_col=id_col, payload_col=payload_col)
    if persist:
        h = persist(h) if callable(persist) else h.persist()
    pairs = phash_near_pairs(
        media,
        max_hamming,
        hashes=h,
        max_bucket_rows=max_bucket_rows,
    )
    dropped = pairs.select(F.col("m2").alias("media_id")).distinct()
    return (
        h.join(dropped.withColumn("_d", F.lit(True)), "media_id", "left")
        .select(
            "media_id",
            "phash",
            F.coalesce(~F.col("_d"), F.lit(True)).alias("keep"),
        )
    )


def incremental_phash_dedup(
    existing_hashes: DataFrame,
    delta_media: DataFrame,
    *,
    max_hamming: int = 3,
    id_col: str = "media_id",
    payload_col: str = "payload",
    hashes: DataFrame | None = None,
    max_bucket_rows: int | None = 100_000,
    persist=None,
) -> DataFrame:
    """Deduplicate a NEW image ingestion batch against an existing
    corpus — the image twin of ``curation.incremental_dedup``, with the
    corpus side touched ONLY through its materialized ``(media_id,
    phash)`` hash table (8 B/image — the production substrate
    ``sigstore.read_media_hash_store`` serves; image bytes never
    rescanned).  Per delta image:

    - ``is_exact_dup`` — its pHash is bit-identical to an existing
      hash, or to an EARLIER (smaller-id) delta image's;
    - ``n_near_existing`` — existing images within ``max_hamming``;
    - ``n_near_delta_earlier`` — same, against smaller-id delta images
      only (the deterministic greedy first-wins rule of the text tier);
    - ``kept`` — none of the above fired.

    Scale shape: delta hashes come from ONE zero-shuffle mapInPandas
    pass (or the ``hashes=`` seam), computed ONCE when a ``persist``
    hook is supplied (the table feeds five consumers); both probes are
    exact banded
    Hamming equi-joins on (band_id, band_bits) int keys — pigeonhole
    over ``max_hamming + 1`` bands, zero false negatives — with the
    hot-bucket guard default-on on BOTH tables, and everything
    delta-internal is bounded by batch size.
    """
    if not 0 <= max_hamming < PHASH_BITS:
        raise ValueError(f"need 0 <= max_hamming < {PHASH_BITS}")
    persist = persist or (lambda df: df)
    # the delta hash table feeds FIVE consumers (both band probes, both
    # exact probes, and the final select) — unpersisted, the
    # decode+pHash Python pass re-runs per consumer
    hd = persist(
        hashes if hashes is not None else phash_images(
            delta_media, id_col=id_col, payload_col=payload_col
        )
    )
    he = existing_hashes.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("phash").cast("long").alias("phash"),
    )
    bd = phash_band_keys(
        hd,
        max_hamming,
        max_bucket_rows=max_bucket_rows,
        op_name="incremental_phash_dedup[delta]",
    )
    be = phash_band_keys(
        he,
        max_hamming,
        max_bucket_rows=max_bucket_rows,
        op_name="incremental_phash_dedup[existing]",
    ).select(
        F.col("media_id").alias("e_id"),
        F.col("phash").alias("e_phash"),
        "band_id",
        "band_bits",
    )
    near_e = (
        bd.join(be, ["band_id", "band_bits"])
        .filter(
            F.bit_count(F.col("phash").bitwiseXOR(F.col("e_phash")))
            <= max_hamming
        )
        .select("media_id", "e_id")
        .distinct()
        .groupBy("media_id")
        .agg(F.count("*").alias("n_near_existing"))
    )
    b2 = bd.select(
        F.col("media_id").alias("d_id"),
        F.col("phash").alias("d_phash"),
        "band_id",
        "band_bits",
    )
    near_d = (
        bd.join(b2, ["band_id", "band_bits"])
        .filter(
            (F.col("d_id") < F.col("media_id"))
            & (
                F.bit_count(F.col("phash").bitwiseXOR(F.col("d_phash")))
                <= max_hamming
            )
        )
        .select("media_id", "d_id")
        .distinct()
        .groupBy("media_id")
        .agg(F.count("*").alias("n_near_delta_earlier"))
    )
    exact_e = (
        hd.join(
            he.select(F.col("phash").alias("e_phash")).distinct(),
            F.col("phash") == F.col("e_phash"),
            "left_semi",
        )
        .select("media_id")
        .withColumn("_xe", F.lit(True))
    )
    d2 = hd.select(
        F.col("media_id").alias("d_id"), F.col("phash").alias("d_phash")
    )
    exact_d = (
        hd.join(
            d2,
            (F.col("phash") == F.col("d_phash"))
            & (F.col("d_id") < F.col("media_id")),
            "left_semi",
        )
        .select("media_id")
        .withColumn("_xd", F.lit(True))
    )
    return (
        hd.join(near_e, "media_id", "left")
        .join(near_d, "media_id", "left")
        .join(exact_e, "media_id", "left")
        .join(exact_d, "media_id", "left")
        .select(
            "media_id",
            "phash",
            (F.coalesce(F.col("_xe"), F.lit(False))
             | F.coalesce(F.col("_xd"), F.lit(False))).alias("is_exact_dup"),
            F.coalesce(F.col("n_near_existing"), F.lit(0))
            .cast("long")
            .alias("n_near_existing"),
            F.coalesce(F.col("n_near_delta_earlier"), F.lit(0))
            .cast("long")
            .alias("n_near_delta_earlier"),
        )
        .withColumn(
            "kept",
            ~F.col("is_exact_dup")
            & (F.col("n_near_existing") == 0)
            & (F.col("n_near_delta_earlier") == 0),
        )
    )


__all__ = [
    "PHASH_BITS",
    "PHASH_SIZE",
    "incremental_phash_dedup",
    "phash_band_keys",
    "phash_bytes",
    "phash_dedup",
    "phash_frames",
    "phash_images",
    "phash_near_pairs",
    "video_near_pairs",
]
