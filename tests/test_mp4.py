"""From-scratch MP4 (ISO BMFF) muxer/demuxer (sources/mp4.py): box
tree round-trips, the stsc/stco/stsz chunk walk, codec seam behavior,
and the multimodal/pHash integration."""

import struct

import numpy as np
import pandas as pd
import pytest

from pandas_sigproc_spark.sources.bmp import encode_bmp
from pandas_sigproc_spark.sources.jpeg import encode_jpeg
from pandas_sigproc_spark.sources.mp4 import (
    decode_mp4,
    decode_mp4_frames,
    encode_mp4,
    is_mp4_bytes,
)


def _smooth(seed: int, h: int = 32, w: int = 32) -> np.ndarray:
    r = np.random.default_rng(seed)
    base = r.standard_normal((8, 8))
    big = np.kron(base, np.ones((h // 8, w // 8)))
    big = (big - big.min()) / (big.max() - big.min()) * 255
    return np.repeat(big[:, :, None], 3, 2).astype(np.uint8)


def test_mux_demux_roundtrip_bmp_samples():
    frames = [encode_bmp(_smooth(i)) for i in range(5)]
    mp4 = encode_mp4(frames, frame_duration=33)
    assert is_mp4_bytes(mp4)
    trk = decode_mp4(mp4)
    assert trk.codec == b"bmp "
    assert (trk.width, trk.height) == (32, 32)
    assert trk.samples == frames  # byte-exact sample slicing
    assert trk.durations == [33] * 5 and trk.timescale == 1000
    px = decode_mp4_frames(mp4)
    assert len(px) == 5 and px[0].shape == (32, 32, 3)


def test_jpeg_coded_samples_roundtrip():
    frames = [encode_jpeg(_smooth(i), 90) for i in range(3)]
    trk = decode_mp4(encode_mp4(frames, codec=b"jpg "))
    assert trk.codec == b"jpg " and trk.samples == frames
    assert len(decode_mp4_frames(encode_mp4(frames, codec=b"jpg "))) == 3


def test_compressed_codec_container_parses_pixels_refused():
    avc = encode_mp4(
        [b"\x00\x01fakeNAL"] * 2, codec=b"avc1", width=64, height=48
    )
    trk = decode_mp4(avc)
    assert trk.codec == b"avc1"
    assert (trk.width, trk.height) == (64, 48)
    assert len(trk.samples) == 2  # sample BYTES fully available
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_mp4_frames(avc)


def test_guards():
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4(b"RIFFxxxxWAVE" * 4)
    with pytest.raises(ValueError):
        encode_mp4([])
    with pytest.raises(ValueError):
        encode_mp4([b"x"], codec=b"toolong5")
    # truncated: either the mdat box overruns (corrupt) or moov is
    # missing — both must refuse, never return a partial track
    frames = [encode_bmp(_smooth(1))]
    mp4 = encode_mp4(frames)
    with pytest.raises(ValueError):
        decode_mp4(mp4[:200])
    ftyp_len = struct.unpack(">I", mp4[:4])[0]
    with pytest.raises(ValueError, match="moov"):
        decode_mp4(mp4[:ftyp_len])  # clean ftyp, nothing else


def test_multichunk_walk():
    """A hand-built stco/stsc layout with TWO chunks and uneven
    samples-per-chunk exercises the general chunk walk (the muxer
    itself writes one chunk)."""
    frames = [encode_bmp(_smooth(i)) for i in range(5)]
    mp4 = bytearray(encode_mp4(frames))
    # rewrite stsc to runs (chunk1: 2 samples, chunk2: 3 samples) and
    # stco to two offsets
    # stsc entries are 12 bytes: (first_chunk, samples_per_chunk, sdi)
    one_run = struct.pack(">III", 1, 2, 1) + struct.pack(">III", 2, 3, 1)
    from pandas_sigproc_spark.sources import mp4 as M

    ftyp_end = struct.unpack(">I", mp4[:4])[0]
    base = ftyp_end + 8  # first sample byte
    off2 = base + len(frames[0]) + len(frames[1])
    stsc = M._full(b"stsc", 0, 0, struct.pack(">I", 2) + one_run)
    stco = M._full(b"stco", 0, 0, struct.pack(">III", 2, base, off2))
    # splice: find old boxes and replace (sizes differ, so rebuild moov)
    data = bytes(mp4)
    trk = decode_mp4(data)  # sanity: single-chunk parse first
    assert trk.samples == frames
    moov_i = data.index(b"moov") - 4
    moov = data[moov_i:]
    old_stsc_i = moov.index(b"stsc") - 4
    old_stsc_len = struct.unpack(">I", moov[old_stsc_i : old_stsc_i + 4])[0]
    old_stco_i = moov.index(b"stco") - 4
    old_stco_len = struct.unpack(">I", moov[old_stco_i : old_stco_i + 4])[0]
    new_moov = (
        moov[:old_stsc_i]
        + stsc
        + moov[old_stsc_i + old_stsc_len : old_stco_i]
        + stco
        + moov[old_stco_i + old_stco_len :]
    )

    # fix enclosing box sizes (moov/trak/mdia/minf/stbl) by the delta
    delta = len(new_moov) - len(moov)
    new_moov = bytearray(new_moov)
    pos = 0  # moov header
    for typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        idx = bytes(new_moov).index(typ, pos) - 4
        size = struct.unpack(">I", new_moov[idx : idx + 4])[0]
        new_moov[idx : idx + 4] = struct.pack(">I", size + delta)
        pos = idx + 8
    data2 = data[:moov_i] + bytes(new_moov)
    trk2 = decode_mp4(data2)
    assert trk2.samples == frames  # same bytes through the 2-chunk walk


def test_decode_payload_and_sample_frames_speak_mp4(spark):
    from pandas_sigproc_spark.operators.multimodal import (
        decode_payload,
        sample_frames,
    )

    frames = [encode_bmp(_smooth(i)) for i in range(6)]
    mp4 = encode_mp4(frames)
    assert decode_payload(mp4, "video", codec="real") == (32, 32, 6)
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [7], "kind": ["video"], "payload": [mp4]}
        ),
        "media_id long, kind string, payload binary",
    )
    out = sample_frames(media, every_n=2, codec="real").collect()
    assert sorted(r.frame_idx for r in out) == [0, 2, 4]
    assert all(bytes(r.frame) == frames[r.frame_idx] for r in out)


def test_phash_frames_speak_mp4(spark):
    from pandas_sigproc_spark.operators.imagedup import (
        phash_bytes,
        phash_frames,
    )

    frames = [encode_bmp(_smooth(40 + i, 64, 64)) for i in range(4)]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [1], "payload": [encode_mp4(frames)]}),
        "media_id long, payload binary",
    )
    out = phash_frames(media).toPandas()
    assert len(out) == 4
    for _, r in out.iterrows():
        assert int(r.phash) == phash_bytes(frames[int(r.frame_idx)])


def test_sample_slice_past_eof_refuses():
    # r13 review finding: sample slices past end-of-data (a moov-first
    # file truncated mid-mdat) yielded silently short/empty samples
    # while the count check passed.  Simulate by patching the stco
    # chunk offset to near-EOF on an otherwise valid file.
    full = bytearray(
        encode_mp4([b"frame-one-bytes", b"frame-two-bytes"], width=4, height=4)
    )
    i = bytes(full).find(b"stco")
    assert i > 0
    # stco: tag(4) ver/flags(4) count(4) then offsets
    full[i + 12 : i + 16] = struct.pack(">I", len(full) - 4)
    with pytest.raises(ValueError, match="extends past"):
        decode_mp4(bytes(full))
