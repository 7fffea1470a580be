"""Audio fingerprint deduplication — near-dup detection over binary
audio columns (the audio member of the dedup modality set: text has
MinHash/SimHash/PPJoin, images pHash; this is the constellation-hash
method of Wang's Shazam paper, "An Industrial-Strength Audio Search
Algorithm", ISMIR 2003).

Fingerprints: decode the RIFF/WAVE payload with the engine's own codec
(sources/wav.py), mono-mix, Hann-windowed STFT (1024-sample frames, 512
hop), pick the argmax bin of each of 4 log-spaced frequency bands per
frame (gain-INVARIANT by construction — argmax ignores scale), then
hash (f1, f2, dt) triples over a forward target zone of 3 frames within
the band.  Each hash packs into one BIGINT; an audio file yields
~frames x 4 x 3 hashes (a few hundred per second of audio).

Distributed shape:

- ``audio_fingerprints``: ONE zero-shuffle ``mapInPandas`` pass —
  payload bytes in, exploded ``(media_id, fp)`` rows out.  Like the
  text tier's band keys, the fingerprint table is the ~dozens-of-
  bytes-per-second derived form a deployment materializes
  (signature-store pattern) so matching never re-decodes audio.
- ``audio_near_pairs``: equi-join on the fp key + per-pair match
  counting — the same bounded-key self-join shape as every dedup tier;
  ``max_df`` drops degenerate hashes (silence, test tones shared by
  thousands of files) exactly like the Jaccard tier's hot-shingle cap.
  A pair's evidence is ``n_matches`` (shared distinct hashes) and
  ``match_frac`` (vs the smaller side's hash count).

Invariances (pinned in tests/test_audiodup.py): byte-identical and
gain-scaled copies match at frac 1.0; hop-aligned time shifts and mild
additive noise keep frac high; unrelated material stays near 0.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FP_FRAME = 1024  # STFT frame length (samples)
FP_HOP = 512  # hop (samples)
FP_BANDS = ((1, 32), (32, 96), (96, 224), (224, 512))  # rfft bin ranges
FP_FANOUT = 3  # forward target-zone frames per anchor
FP_PROMINENCE = 8.0  # peak > prominence x band mean, else no hash

# The STFT profile is configuration, not algorithm: every parameter
# threads through the same code path, so a gate-scale profile (short
# frames over the driver's ~50-86-sample channels, where a 1024-point
# frame would not even fit once) certifies exactly the pipeline the
# production defaults run — windowing, DFT magnitudes, prominence-gated
# band argmax, (f1, f2, dt) packing — at a size whose full relational
# replay stays DuckDB-tractable (__spark_entry__._sql_audio_fp).


def fingerprint_samples(
    x: np.ndarray,
    *,
    frame: int = FP_FRAME,
    hop: int = FP_HOP,
    bands: tuple = FP_BANDS,
    fanout: int = FP_FANOUT,
    prominence: float = FP_PROMINENCE,
) -> np.ndarray:
    """int64 constellation hashes of one mono sample array."""
    n = len(x)
    if n < frame:
        return np.zeros(0, dtype=np.int64)
    nf = 1 + (n - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
    frames = x[idx] * np.hanning(frame)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    # per-band argmax bin per frame: (nf, n_bands), gain-invariant —
    # but only PROMINENT peaks count: a band holding silence or flat
    # noise has an argmax too, and those degenerate (lo-bin, lo-bin)
    # hashes would be shared by every file (the first cut of this
    # module measured 0.31 "similarity" between unrelated clips from
    # exactly that).  Prominence = peak > `prominence` x its band's
    # mean magnitude in that frame — a RATIO, so gain invariance is
    # preserved.
    peaks = np.stack(
        [lo + np.argmax(mag[:, lo:hi], axis=1) for lo, hi in bands],
        axis=1,
    ).astype(np.int64)
    peak_mag = np.stack(
        [np.max(mag[:, lo:hi], axis=1) for lo, hi in bands], axis=1
    )
    band_mean = np.stack(
        [np.mean(mag[:, lo:hi], axis=1) for lo, hi in bands], axis=1
    )
    valid = peak_mag > prominence * band_mean + 1e-12
    hashes = []
    for dt in range(1, fanout + 1):
        if nf <= dt:
            break
        f1 = peaks[:-dt]  # (nf-dt, bands)
        f2 = peaks[dt:]
        ok = valid[:-dt] & valid[dt:]
        band_ids = np.arange(len(bands), dtype=np.int64)[None, :]
        h = (
            (band_ids << 40)
            | (f1 << 24)
            | (f2 << 8)
            | np.int64(dt)
        )
        hashes.append(h[ok].reshape(-1))
    if not hashes:
        return np.zeros(0, np.int64)
    out = np.concatenate(hashes)
    return np.unique(out) if out.size else np.zeros(0, np.int64)


def fingerprint_bytes(payload: bytes, **profile) -> np.ndarray:
    """Hashes of one RIFF/WAVE payload (mono mix of all channels)."""
    from pandas_sigproc_spark.sources.wav import decode_wav_bytes

    _rate, arr = decode_wav_bytes(bytes(payload))
    return fingerprint_samples(arr.astype(np.float64).mean(axis=1), **profile)


def audio_fingerprints(
    media: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    **profile,
) -> DataFrame:
    """(media_id long, fp long): exploded fingerprint table via one
    zero-shuffle mapInPandas pass — the materializable derived form.
    ``profile`` (frame/hop/bands/fanout/prominence) overrides the
    production STFT constants; the closure ships only those scalars."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                h = fingerprint_bytes(bytes(payload), **profile)
                ids.extend([int(mid)] * len(h))
                fps.extend(int(v) for v in h)
            yield pd.DataFrame({"media_id": ids, "fp": fps})

    return media.select(id_col, payload_col).mapInPandas(
        run, "media_id long, fp long"
    )


def audio_near_pairs(
    media: DataFrame,
    min_match_frac: float = 0.2,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fingerprints: DataFrame | None = None,
    max_df: int | None = 1000,
    persist=None,
    **profile,
) -> DataFrame:
    """All audio pairs (m1 < m2) sharing at least ``min_match_frac`` of
    the smaller side's fingerprint hashes.

    Output: ``(m1, m2, n_matches long, match_frac double)``.
    ``fingerprints`` short-circuits the decode with a precomputed
    (media_id, fp) table.  ``max_df`` drops hashes present in more than
    that many files (silence/test-tone degeneracy — the hot-shingle cap
    of the Jaccard tier) from matching AND from the per-file totals, so
    the ratio stays a true fraction of the df-filtered hash sets.
    ``persist`` (e.g. ``DataFrame.persist``-wrapping cache hooks) is
    applied to the fingerprint table, which feeds FOUR consumers (df
    cap, both join sides, sizes) — without it Spark re-runs the
    decode+STFT Python pass once per consumer, the one expensive stage
    of the plan.  A production deployment materializes the table
    instead (the signature-store pattern), which is the same cut made
    durable.
    """
    if not 0.0 < min_match_frac <= 1.0:
        raise ValueError("need 0 < min_match_frac <= 1")
    persist = persist or (lambda df: df)
    fp = persist(
        fingerprints
        if fingerprints is not None
        else audio_fingerprints(
            media, id_col=id_col, payload_col=payload_col, **profile
        )
    )
    if max_df is not None:
        hot = (
            fp.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    sizes = fp.groupBy("media_id").agg(F.count("*").alias("n_fp"))
    a = fp.alias("a")
    b = fp.alias("b")
    matches = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("m1"), F.col("b.media_id").alias("m2")
        )
        .agg(F.count("*").alias("n_matches"))
    )
    # NO broadcast hint on the size table: it has one row per FILE
    # (corpus-sized at 100 TB) — AQE broadcasts it at gate scale on its
    # own, and a sort-merge join on the already-shuffled pair keys is
    # the right plan when it outgrows the threshold
    s1 = sizes.select(F.col("media_id").alias("m1"), F.col("n_fp").alias("n1"))
    s2 = sizes.select(F.col("media_id").alias("m2"), F.col("n_fp").alias("n2"))
    return (
        matches.join(s1, "m1")
        .join(s2, "m2")
        .select(
            "m1",
            "m2",
            "n_matches",
            F.round(
                F.col("n_matches") / F.least("n1", "n2"), 6
            ).alias("match_frac"),
        )
        .filter(F.col("match_frac") >= min_match_frac)
    )


def incremental_audio_dedup(
    existing_fps: DataFrame,
    delta_media: DataFrame,
    *,
    min_match_frac: float = 0.2,
    id_col: str = "media_id",
    payload_col: str = "payload",
    fingerprints: DataFrame | None = None,
    max_df: int | None = 1000,
    persist=None,
    **profile,
) -> DataFrame:
    """Deduplicate a NEW audio ingestion batch against an existing
    corpus — the audio twin of ``imagedup.incremental_phash_dedup``,
    with the corpus side touched ONLY through its materialized
    ``(media_id, fp)`` fingerprint table (the form
    ``sigstore.write_media_hash_store(kind="audio_fp")`` persists;
    corpus audio never re-decoded).  Per delta clip:

    - ``n_fp`` — its df-filtered fingerprint count (0 for silence);
    - ``n_near_existing`` — existing clips sharing at least
      ``min_match_frac`` of the smaller side's hashes;
    - ``n_near_delta_earlier`` — same, against SMALLER-ID delta clips
      only (the deterministic greedy first-wins rule);
    - ``kept`` — neither fired.

    ``max_df`` drops hashes present in more than that many files of
    the COMBINED existing+delta corpus (matching ``audio_near_pairs``'
    degeneracy semantics) from matching and from both sides' totals.
    ``persist`` is applied to the delta fingerprint table (it feeds
    the df cap, both probes, and the sizes) — without it the
    decode+STFT pass re-runs per consumer.

    Scale shape: both probes are bounded fp equi-joins; everything
    delta-internal is bounded by batch size; the existing side is a
    compact hash table, dozens of bytes per second of audio.
    """
    if not 0.0 < min_match_frac <= 1.0:
        raise ValueError("need 0 < min_match_frac <= 1")
    persist = persist or (lambda df: df)
    fd = persist(
        fingerprints
        if fingerprints is not None
        else audio_fingerprints(
            delta_media, id_col=id_col, payload_col=payload_col, **profile
        )
    )
    fe = existing_fps.select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("fp").cast("long").alias("fp"),
    )
    if max_df is not None:
        hot = (
            fe.unionByName(fd)
            .groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        fe = fe.join(F.broadcast(hot), "fp", "left_anti")
        fd = fd.join(F.broadcast(hot), "fp", "left_anti")
    sizes_d = fd.groupBy("media_id").agg(F.count("*").alias("n_fp"))
    sizes_e = fe.groupBy("media_id").agg(F.count("*").alias("n_fp"))
    e = fe.select(
        F.col("media_id").alias("e_id"), "fp"
    ).join(
        sizes_e.select(F.col("media_id").alias("e_id"), F.col("n_fp").alias("ne")),
        "e_id",
    )
    d_sized = fd.join(sizes_d, "media_id")
    near_e = (
        d_sized.join(e, "fp")
        .groupBy("media_id", "e_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.first("n_fp").alias("nd"),
            F.first("ne").alias("ne"),
        )
        .filter(
            F.round(F.col("n_matches") / F.least("nd", "ne"), 6)
            >= min_match_frac
        )
        .groupBy("media_id")
        .agg(F.count("*").alias("n_near_existing"))
    )
    d2 = fd.select(F.col("media_id").alias("d_id"), "fp").join(
        sizes_d.select(F.col("media_id").alias("d_id"), F.col("n_fp").alias("n2")),
        "d_id",
    )
    near_d = (
        d_sized.join(d2, "fp")
        .filter(F.col("d_id") < F.col("media_id"))
        .groupBy("media_id", "d_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.first("n_fp").alias("nd"),
            F.first("n2").alias("n2"),
        )
        .filter(
            F.round(F.col("n_matches") / F.least("nd", "n2"), 6)
            >= min_match_frac
        )
        .groupBy("media_id")
        .agg(F.count("*").alias("n_near_delta_earlier"))
    )
    ids = delta_media.select(
        F.col(id_col).cast("long").alias("media_id")
    ).distinct()
    return (
        ids.join(sizes_d, "media_id", "left")
        .join(near_e, "media_id", "left")
        .join(near_d, "media_id", "left")
        .select(
            "media_id",
            F.coalesce(F.col("n_fp"), F.lit(0)).cast("long").alias("n_fp"),
            F.coalesce(F.col("n_near_existing"), F.lit(0))
            .cast("long")
            .alias("n_near_existing"),
            F.coalesce(F.col("n_near_delta_earlier"), F.lit(0))
            .cast("long")
            .alias("n_near_delta_earlier"),
        )
        .withColumn(
            "kept",
            (F.col("n_near_existing") == 0)
            & (F.col("n_near_delta_earlier") == 0),
        )
    )


__all__ = [
    "FP_BANDS",
    "FP_FANOUT",
    "FP_FRAME",
    "FP_HOP",
    "FP_PROMINENCE",
    "audio_fingerprints",
    "audio_near_pairs",
    "fingerprint_bytes",
    "fingerprint_samples",
    "incremental_audio_dedup",
]
