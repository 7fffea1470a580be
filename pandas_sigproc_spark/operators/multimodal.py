"""Multimodal (image / audio / video) column operators.

The engine treats media as opaque ``binary`` payload columns plus typed
metadata, processed with Arrow-batched ``mapInPandas`` so payloads never
round-trip through Python row objects one at a time.  This mirrors how a
large-scale training-data pipeline handles media at 100 TB: the bytes
stay columnar end to end, decode happens vectorized per Arrow batch
inside executors, and the output schema is fixed so Catalyst can prune.

The decode step is isolated behind :func:`decode_payload`:

- ``codec='real'`` runs the engine's from-scratch codecs on real bytes:
  RIFF/WAVE audio (sources/wav.py), 24-bit BMP, baseline PNG, and
  baseline JPEG images (sources/bmp.py, sources/png.py, sources/jpeg.py
  — magic-dispatched), and the BMPV frame container for video — decode,
  nearest-neighbour resize (format-preserving re-encode), and frame
  sampling all operate on real pixels.  Video containers: real MP4
  (ISO BMFF — from-scratch muxer/demuxer, sources/mp4.py; samples in
  the engine's image codecs decode to pixels, compressed codecs
  surface bytes + metadata) and the BMPV toy container.
- ``codec='fake'`` (plumbing tests) derives deterministic pseudo
  metadata and pixel statistics from the raw bytes, so the Spark-side
  plumbing — schema, batch iteration, partitioning, UDF signatures — is
  exercised even for payloads that aren't decodable media.

Media model::

    media(media_id BIGINT, kind STRING, payload BINARY,
          meta MAP<STRING, STRING>)

There is no media table in the driver's testdata, so
:func:`synthesize_media` builds one deterministically from ``documents``
(utf-8 bytes of ``text`` as payload) — the harness used by tests and the
``media_features`` query.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "width int, height int, n_frames int, "
    "byte_mean double, byte_std double, head_hash string"
)


def _decode_image(data: bytes) -> np.ndarray:
    """Magic-dispatched real image decode: 24-bit BMP (sources/bmp.py),
    baseline PNG (sources/png.py — from-scratch on stdlib zlib),
    baseline/progressive JPEG (sources/jpeg.py — from-scratch DCT +
    Huffman), or GIF (sources/gif.py — from-scratch LZW; the first
    composited frame)."""
    if data[:4] == b"BMPV":
        # the BMPV VIDEO container shares the b"BM" prefix the BMP
        # dispatch below keys on — without this guard a video payload
        # fell into the single-image decoder and died on a garbage
        # header (a review finding); name the real problem instead
        raise NotImplementedError(
            "payload is a BMPV video container, not a single image —"
            " route video payloads through sample_frames/decode_payload"
        )
    if data[:2] == b"BM":
        from pandas_sigproc_spark.sources.bmp import decode_bmp_bytes

        return decode_bmp_bytes(data)
    if data[:2] == b"\xff\xd8":
        from pandas_sigproc_spark.sources.jpeg import decode_jpeg_bytes

        return decode_jpeg_bytes(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from pandas_sigproc_spark.sources.gif import decode_gif

        return decode_gif(data)[0]
    from pandas_sigproc_spark.sources import png as _png

    if data[: len(_png.SIGNATURE)] == _png.SIGNATURE:
        return _png.decode_png_bytes(data)
    raise NotImplementedError(
        "unrecognized image container: real codecs cover 24-bit BMP, "
        "baseline PNG, baseline/progressive JPEG, and GIF; other "
        "formats plug in at this seam (operators/multimodal.py)"
    )


def _encode_image_like(px: np.ndarray, original: bytes) -> bytes:
    """Re-encode in the ORIGINAL payload's container (format-preserving
    resize)."""
    from pandas_sigproc_spark.sources import png as _png

    if original[: len(_png.SIGNATURE)] == _png.SIGNATURE:
        return _png.encode_png(px)
    if original[:2] == b"\xff\xd8":
        from pandas_sigproc_spark.sources.jpeg import encode_jpeg

        return encode_jpeg(px)
    if original[:6] in (b"GIF87a", b"GIF89a"):
        # nearest-neighbour resize only samples existing pixels, so the
        # result stays inside the original's <=256-color palette
        from pandas_sigproc_spark.sources.gif import encode_gif

        return encode_gif(px)
    from pandas_sigproc_spark.sources.bmp import encode_bmp

    return encode_bmp(px)


def decode_payload(payload: bytes, kind: str, codec: str = "fake"):
    """Decode one media payload to (width, height, n_frames).

    ``codec='real'`` decodes every kind with the engine's from-scratch
    codecs: audio is a whole RIFF/WAVE file (``sources/wav.py``,
    returning (n_samples, n_channels, 1)), image is magic-dispatched
    BMP/PNG/JPEG, video the BMPV frame container.  ``codec='fake'``
    derives deterministic dimensions from the byte length so the
    distributed plumbing around the decode is testable for every kind.
    """
    if codec == "real":
        if kind == "audio":
            from pandas_sigproc_spark.sources.wav import decode_wav_bytes

            _rate, arr = decode_wav_bytes(bytes(payload))
            return arr.shape[0], arr.shape[1], 1
        if kind == "image":
            px = _decode_image(bytes(payload))
            return px.shape[1], px.shape[0], 1
        if kind == "video":
            from pandas_sigproc_spark.sources.mp4 import decode_mp4, is_mp4_bytes

            if is_mp4_bytes(bytes(payload)):
                # real ISO BMFF: dims + sample count from the box tree —
                # no sample decode needed, so this works for ANY codec
                trk = decode_mp4(bytes(payload))
                return trk.width, trk.height, len(trk.samples)
            from pandas_sigproc_spark.sources.gif import decode_gif, is_gif_bytes

            if is_gif_bytes(bytes(payload)):
                frames = decode_gif(bytes(payload))
                return frames[0].shape[1], frames[0].shape[0], len(frames)
            from pandas_sigproc_spark.sources.bmp import decode_bmp_bytes, decode_bmpv

            frames = decode_bmpv(bytes(payload))
            px = decode_bmp_bytes(frames[0]) if frames else np.zeros((0, 0, 3))
            return px.shape[1], px.shape[0], len(frames)
        raise NotImplementedError(
            f"no real codec for media kind {kind!r}: audio decodes RIFF/WAVE "
            "(sources/wav.py), image decodes 24-bit BMP, baseline PNG, "
            "baseline/progressive JPEG, and GIF (sources/bmp.py, png.py, "
            "jpeg.py, gif.py), video the BMPV, MP4 (ISO BMFF), and "
            "animated-GIF containers; compressed-codec sample decode "
            "plugs in at sources/mp4.py"
        )
    n = len(payload)
    if kind == "image":
        return 16 + n % 640, 16 + (n * 7) % 480, 1
    if kind == "video":
        return 16 + n % 320, 16 + (n * 7) % 240, 1 + n % 30
    if kind == "audio":
        # audio: "samples" in one logical frame
        return n, 1, 1
    # the fake path must enforce the same kind contract as the real
    # one: silently treating a typo'd kind as audio let plumbing tests
    # green-light a misrouted kind (a review finding)
    raise ValueError(
        f"unknown media kind {kind!r}: expected image|video|audio"
    )


def extract_media_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Per-payload features via mapInPandas (Arrow-batched).

    ``mapInPandas`` (not applyInPandas) because feature extraction is
    embarrassingly parallel per row — no grouping, no shuffle: each task
    streams its parquet split through Python once.  At 100 TB this is the
    only shape that works; a groupBy would shuffle the payload bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    # null-as-empty (the text tier's NULL rule): a NULL
                    # payload otherwise dies in np.frombuffer(None)
                    # with an anonymous TypeError that names neither
                    # the row nor the contract (an r15 review finding)
                    payload = b""
                buf = np.frombuffer(payload, dtype=np.uint8)
                w, h, nf = decode_payload(bytes(payload), kind, codec=codec)
                rows.append(
                    (
                        int(media_id),
                        kind,
                        int(buf.size),
                        int(w),
                        int(h),
                        int(nf),
                        float(buf.mean()) if buf.size else 0.0,
                        float(buf.std()) if buf.size else 0.0,
                        hashlib.md5(bytes(payload[:64])).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "byte_mean",
                    "byte_std",
                    "head_hash",
                ],
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, width: int, height: int, codec: str = "fake") -> DataFrame:
    """Resize to (width, height), binary in -> binary out.

    ``codec='real'``: magic-dispatched decode (BMP/PNG/JPEG),
    nearest-neighbour resample over real pixels, FORMAT-PRESERVING
    re-encode (a JPEG comes back as a JPEG).  ``codec='fake'``:
    tile/truncate the raw byte buffer to width*height — the
    plumbing-only path for payloads that aren't images at all.
    Output stays binary so downstream stages keep the same media model.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            rows = []
            # the real path decodes IMAGES only: audio/video rows of
            # the canonical mixed media table are passed over instead
            # of crashing the batch in an image decoder (a review
            # finding); tables without a kind column treat every row
            # as an image, the pre-r12 contract
            kinds = (
                pdf["kind"]
                if "kind" in pdf.columns
                else pd.Series(["image"] * len(pdf))
            )
            for media_id, kind, payload in zip(
                pdf["media_id"], kinds, pdf["payload"]
            ):
                if payload is None:
                    payload = b""  # null-as-empty, as in
                    # extract_media_features (r15 review finding)
                if codec == "real" and kind != "image":
                    continue
                if codec == "real":
                    from pandas_sigproc_spark.sources.bmp import resize_nearest

                    raw = bytes(payload)
                    px = _decode_image(raw)
                    out_b = _encode_image_like(
                        resize_nearest(px, width, height), raw
                    )
                    rows.append((int(media_id), width, height, out_b))
                    continue
                buf = np.frombuffer(payload, dtype=np.uint8)
                out = np.resize(buf, n_out) if buf.size else np.zeros(n_out, np.uint8)
                rows.append((int(media_id), width, height, out.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload"]
            )

    return df.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def sample_frames(df: DataFrame, every_n: int = 10, codec: str = "fake") -> DataFrame:
    """Frame sampling for video payloads: 1 row in, n_frames/every_n out.

    UDTF-shaped (one payload explodes into many frames) — mapInPandas
    yields more rows than it consumes, which is exactly what Spark's
    iterator contract allows; no explode of materialized arrays needed.
    """
    if every_n < 1:
        # driver-side, like phash_frames — not a range() error surfaced
        # from an executor (a review finding)
        raise ValueError(f"need every_n >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video":
                    continue
                if payload is None:
                    payload = b""  # null-as-empty, as in
                    # extract_media_features (r15 review finding)
                if codec == "real":
                    from pandas_sigproc_spark.sources.bmp import (
                        decode_bmpv,
                        encode_bmp,
                    )
                    from pandas_sigproc_spark.sources.gif import (
                        decode_gif,
                        is_gif_bytes,
                    )
                    from pandas_sigproc_spark.sources.mp4 import (
                        decode_mp4,
                        is_mp4_bytes,
                    )

                    raw = bytes(payload)
                    # the SAME three-way video dispatch as decode_payload
                    # and imagedup.phash_frames (a review finding:
                    # animated-GIF video payloads fell through to the
                    # BMPV decoder and crashed); composited GIF frames
                    # re-encode as BMP — the canonical pixel container
                    # BMPV frames already use — so the frame column
                    # stays decodable bytes
                    if is_mp4_bytes(raw):
                        frames = decode_mp4(raw).samples
                    elif is_gif_bytes(raw):
                        frames = [encode_bmp(px) for px in decode_gif(raw)]
                    else:
                        frames = decode_bmpv(raw)
                    for i in range(0, len(frames), every_n):
                        rows.append((int(media_id), int(i), frames[i]))
                    continue
                w, h, nf = decode_payload(bytes(payload), kind, codec=codec)
                frame_bytes = max(1, len(payload) // max(nf, 1))
                for i in range(0, nf, every_n):
                    start = i * frame_bytes
                    rows.append(
                        (int(media_id), int(i), bytes(payload[start : start + frame_bytes]))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(run, FRAME_SCHEMA)


H264_STREAM_SCHEMA = (
    "media_id long, sample_idx int, n_nals int, nal_types array<int>,"
    " is_keyframe boolean, width int, height int, profile int, level int"
)


def hevc_stream_info(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """The HEVC (hvc1/hev1) twin of :func:`h264_stream_info` — same
    output schema and contracts, parsed by ``sources/hevc.py``: per-
    sample NAL inventory, the IRAP (BLA/IDR/CRA) keyframe flag, and the
    SPS conformance-window geometry + profile/tier/level.  SPS comes
    from the ``hvcC`` record's type-33 array when present (hvc1), else
    in-band (hev1)."""
    return _mp4_stream_info(
        df, id_col, payload_col, on_error, flavor="hevc"
    )


def h264_stream_info(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """H.264 stream inspection over MP4 payloads — one row per SAMPLE
    with its NAL inventory, IDR keyframe flag, and the SPS display
    geometry/profile, WITHOUT decoding pixels (sources/h264.py; the
    entropy/reconstruction seam stays a loud refusal in decode_payload).

    This is the structure a 100 TB video-curation pipeline keys on:
    keyframe-aware frame sampling (sync points decode standalone —
    sampling every Nth compressed delta frame is useless), per-stream
    resolution/profile admission rules, and GOP-shape statistics, all
    from container + parameter-set bytes.

    The SPS comes from the sample entry's ``avcC`` record when present
    (the ``avc1`` norm — its presence also ESTABLISHES length-prefixed
    framing, ADVICE r15), else the first in-band type-7 NAL (the
    ``avc3`` in-band-parameter-set variant; with no config record the
    framing resolves per sample, length-walk-first —
    h264.resolve_framing).  Other
    codecs and malformed containers raise by name; ``on_error="skip"``
    drops them (the third-party-corpus contract of
    wds_members/zip_members — fragmented moof segments and truncated
    sample tables included, not just ValueError shapes).

    Scale shape: zero-shuffle mapInPandas; two cheap box-tree walks +
    a header-byte NAL walk per payload (no pixel buffers, no NAL body
    copies) — output rows are a few ints per sample."""
    return _mp4_stream_info(
        df, id_col, payload_col, on_error, flavor="h264"
    )


def _mp4_stream_info(
    df: DataFrame, id_col: str, payload_col: str, on_error: str, flavor: str
) -> DataFrame:
    """Shared core of h264_stream_info / hevc_stream_info — ONE home
    for the container walk, the out-of-band-then-in-band SPS
    resolution, and the skip taxonomy; only the codec hooks differ."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    skip = on_error == "skip"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pandas_sigproc_spark.sources import h264 as _h
        from pandas_sigproc_spark.sources import hevc as _hv
        from pandas_sigproc_spark.sources.mp4 import (
            decode_mp4,
            video_sample_entry_boxes,
        )

        if flavor == "h264":
            codecs, ext4 = (b"avc1", b"avc3"), b"avcC"
            sps_type, ntype = 7, _h.nal_type
            parse_sps, nal_index = _h.parse_sps, _h.sample_nal_index

            def cfg_sets(box):
                cfg = _h.parse_avcc(box)
                return cfg.length_size, list(cfg.sps)

        else:
            codecs, ext4 = (b"hvc1", b"hev1"), b"hvcC"
            sps_type, ntype = 33, _hv.nal_type
            parse_sps, nal_index = _hv.parse_hevc_sps, _hv.sample_nal_index

            def cfg_sets(box):
                cfg = _hv.parse_hvcc(box)
                return cfg.length_size, list(cfg.nals.get(33, []))

        def sps_tuple(s):
            # SpsInfo and HevcSpsInfo share these attribute names —
            # ONE definition (a review finding: identical per-branch
            # copies invited silent divergence)
            return (s.width, s.height, s.profile_idc, s.level_idc)

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if payload is None:
                        raise ValueError("NULL payload")
                    raw = bytes(payload)
                    trk = decode_mp4(raw)
                    if trk.codec not in codecs:
                        raise ValueError(
                            f"sample codec {trk.codec!r} is not one of"
                            f" {codecs} — this inspector reads"
                            f" {flavor} tracks only (engine image-codec"
                            " tracks decode through decode_mp4_frames)"
                        )
                    ext = video_sample_entry_boxes(raw)
                    if ext4 in ext:
                        length_size, sps_set = cfg_sets(ext[ext4])
                        # the config record *establishes* the framing:
                        # its samples are length-prefixed by ISO
                        # 14496-15 — never run the per-sample Annex-B
                        # heuristic here (an ADVICE finding: a
                        # length-prefixed sample whose first NAL is
                        # 256-511 bytes starts with 00 00 01 xx and
                        # was misparsed as Annex-B)
                        framing = "length"
                    else:
                        length_size, sps_set = 4, []
                        # no config record (in-band avc3/hev1 without
                        # the optional box, or a non-conformant mux):
                        # resolve per sample, length-walk-first
                        framing = "auto"
                    if not sps_set:
                        # in-band parameter sets (the avc3/hev1
                        # variants)
                        for s in trk.samples:
                            sps_set = [
                                nal
                                for nal in _h.split_nals(
                                    s, length_size, framing
                                )
                                if len(nal) >= 2 and ntype(nal) == sps_type
                            ]
                            if sps_set:
                                break
                    if not sps_set:
                        raise ValueError(
                            f"no SPS found in {ext4.decode()} or"
                            " in-band — cannot derive stream geometry"
                        )
                    w, h, prof, lvl = sps_tuple(parse_sps(sps_set[0]))
                    for i, s in enumerate(trk.samples):
                        idx = nal_index(s, length_size, framing)
                        rows.append(
                            (
                                int(mid),
                                i,
                                idx.n_nals,
                                idx.nal_types,
                                idx.is_keyframe,
                                w,
                                h,
                                prof,
                                lvl,
                            )
                        )
                except (ValueError, NotImplementedError):
                    # ValueError = the corrupt-container taxonomy;
                    # NotImplementedError = named seams (fragmented
                    # moof DASH/HLS segments are ubiquitous in
                    # third-party corpora and must be skippable, a
                    # review finding)
                    if skip:
                        continue
                    raise
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_idx",
                    "n_nals",
                    "nal_types",
                    "is_keyframe",
                    "width",
                    "height",
                    "profile",
                    "level",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, H264_STREAM_SCHEMA)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from ``documents`` (test harness).

    Payload = utf-8 bytes of the text; kind cycles image/audio/video by
    ``doc_id % 3`` so every code path gets rows.
    """
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            # pmod: Spark % keeps the dividend's sign, so a negative
            # doc_id indexed 0 (INVALID_INDEX_OF_ZERO) or -1 (silently
            # the LAST element) — a review finding
            (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        # null-as-empty: F.encode propagates NULL, and a NULL payload
        # crashes every downstream byte walk with an anonymous
        # TypeError (np.frombuffer(None)) — the same rule the text
        # tier applies to NULL documents (an r15 review finding)
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias(
            "payload"
        ),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )
