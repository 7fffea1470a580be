"""Audio fingerprint dedup (operators/audiodup.py): constellation-hash
invariance anchors, the match join, the hot-hash cap, and the WAV
integration."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.audiodup import (
    audio_fingerprints,
    audio_near_pairs,
    fingerprint_bytes,
    fingerprint_samples,
)
from pandas_sigproc_spark.sources.wav import encode_wav_bytes

FS = 8000


def _song(seed: int, seconds: float = 3.0) -> np.ndarray:
    """A dozen random tone bursts — structured content with silences."""
    t = np.arange(0, seconds, 1 / FS)
    r = np.random.default_rng(seed)
    x = np.zeros_like(t)
    for _ in range(12):
        f = r.uniform(100, 3500)
        t0 = r.uniform(0, seconds - 1.0)
        dur = r.uniform(0.3, 0.8)
        m = (t >= t0) & (t < t0 + dur)
        x[m] += np.sin(2 * np.pi * f * t[m])
    return x


def _frac(x: np.ndarray, y: np.ndarray) -> float:
    hx, hy = set(fingerprint_samples(x)), set(fingerprint_samples(y))
    return len(hx & hy) / min(len(hx), len(hy))


def test_invariance_anchors():
    rng = np.random.default_rng(4)
    a, b = _song(1), _song(2)
    assert _frac(a, a) == 1.0
    assert _frac(a, 0.3 * a) == 1.0  # gain-invariant by construction
    noisy = a + 0.2 * rng.standard_normal(len(a))
    assert _frac(a, noisy) > 0.7
    shifted = np.concatenate([np.zeros(512 * 4), a])[: len(a)]
    assert _frac(a, shifted) > 0.9  # hop-aligned shift
    assert _frac(a, b) < 0.1  # unrelated material
    # pure noise and silence yield no prominent peaks at all
    assert len(fingerprint_samples(rng.standard_normal(FS * 2))) == 0
    assert len(fingerprint_samples(np.zeros(FS * 2))) == 0


def test_wav_roundtrip_fingerprints():
    a = _song(5)
    payload = encode_wav_bytes(FS, a)
    h = fingerprint_bytes(payload)
    assert len(h) > 10
    # PCM16 quantization barely moves the constellation
    direct = set(int(v) for v in fingerprint_samples(a))
    assert len(set(int(v) for v in h) & direct) / len(direct) > 0.9


def _media(spark, clips: dict[int, np.ndarray]):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": list(clips),
                "payload": [encode_wav_bytes(FS, c) for c in clips.values()],
            }
        ),
        "media_id long, payload binary",
    )


def test_near_pairs_find_planted_copies(spark):
    rng = np.random.default_rng(9)
    a = _song(1)
    clips = {i: _song(10 + i) for i in range(6)}
    clips[100] = a
    clips[101] = 0.5 * a  # gain copy
    clips[102] = a + 0.1 * rng.standard_normal(len(a))  # noisy copy
    clips[0] = a  # also plant under a low id
    media = _media(spark, clips)
    got = {
        (r.m1, r.m2): r.match_frac
        for r in audio_near_pairs(media, 0.5).collect()
    }
    assert got[(0, 100)] == 1.0
    assert got[(0, 101)] == 1.0
    assert got[(0, 102)] > 0.7 and got[(100, 102)] > 0.7
    # no unrelated pair sneaks in at this threshold
    for (m1, m2) in got:
        assert {m1, m2} <= {0, 100, 101, 102}


def test_fingerprint_table_shortcircuit_and_max_df(spark):
    a = _song(1)
    clips = {i: a for i in range(5)}  # five identical files
    media = _media(spark, clips)
    fp = audio_fingerprints(media)
    n_per = fp.groupBy("media_id").count().toPandas()["count"]
    assert n_per.nunique() == 1
    pairs = audio_near_pairs(media, 0.9, fingerprints=fp)
    assert pairs.count() == 10  # all 5-choose-2 at frac 1.0
    # max_df below the file count drops EVERY hash -> no pairs, and the
    # totals shrink consistently (no divide-by-stale-size artifacts)
    assert audio_near_pairs(media, 0.1, max_df=4).count() == 0


def test_validation(spark):
    media = _media(spark, {0: _song(1)})
    with pytest.raises(ValueError):
        audio_near_pairs(media, 0.0)
    with pytest.raises(ValueError):
        audio_near_pairs(media, 1.5)


def test_gate_profile_margin_audit():
    """Cross-engine flip safety for the driver gate (q_audio_fp): the
    oracle recomputes magnitudes as direct DFT folds while the operator
    uses numpy's FFT — different summation orders, ~1e-12 relative
    drift.  A hash flips only if that drift crosses an argmax tie
    (top1 vs top2 in a band) or the prominence threshold (peak vs
    prom * mean + 1e-12).  Measure BOTH margins over the real gate
    inputs at sf0.01 and pin them orders of magnitude above the
    measured FFT-vs-DFT drift — the pHash DCT margin-audit technique.
    """
    import duckdb

    from __spark_entry__ import (
        _AFP_BANDS,
        _AFP_FRAME,
        _AFP_HOP,
        _AFP_PROM,
        _AFP_TILE,
    )

    con = duckdb.connect()
    rows = con.execute(
        "SELECT CAST(user_id AS BIGINT), "
        "LIST(CAST(value AS DOUBLE) ORDER BY epoch(ts), event_id) "
        "FROM '/root/testdata/sf0.01/events.parquet' GROUP BY 1"
    ).fetchall()
    con.close()
    frame, hop = _AFP_FRAME, _AFP_HOP
    k = np.arange(1, frame // 2)
    min_arg, min_prom, max_drift = np.inf, np.inf, 0.0
    for _cid, vals in rows:
        x = np.tile(np.asarray(vals, dtype=np.float64), _AFP_TILE)
        nf = 1 + (len(x) - frame) // hop
        idx = np.arange(frame)[None, :] + hop * np.arange(nf)[:, None]
        fr = x[idx] * np.hanning(frame)[None, :]
        mag = np.abs(np.fft.rfft(fr, axis=1))
        # direct-DFT magnitudes via a different evaluation order
        basis_pow = np.power(
            np.exp(-2j * np.pi / frame), np.outer(np.arange(frame), k)
        )
        dmag = np.abs(fr @ basis_pow)
        max_drift = max(
            max_drift,
            float(np.max(np.abs(dmag - mag[:, 1 : frame // 2]))),
        )
        for lo, hi in _AFP_BANDS:
            band = mag[:, lo:hi]
            top2 = np.sort(band, axis=1)[:, -2:]
            min_arg = min(min_arg, float(np.min(top2[:, 1] - top2[:, 0])))
            peak = band.max(axis=1)
            mean = band.mean(axis=1)
            min_prom = min(
                min_prom,
                float(np.min(np.abs(peak - (_AFP_PROM * mean + 1e-12)))),
            )
    # measured r10: drift ~2e-13, argmax margin ~1e-3, prominence
    # margin ~1e-4 — six+ orders of headroom; pin conservative floors
    assert max_drift < 1e-9, max_drift
    assert min_arg > 1e-5, min_arg
    assert min_prom > 1e-6, min_prom
    assert min_arg > 1e4 * max_drift
    assert min_prom > 1e4 * max_drift
