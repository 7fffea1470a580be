"""source_overlap (operators/curation.py): estimated source-pair
Jaccard against an independent pure-Python MinHash replication."""

import hashlib

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.curation import (
    INCR_MINHASH_P,
    INCR_MINHASH_PERMS,
    source_overlap,
)

DOCS = [
    # srcA and srcB share one identical document; srcC is disjoint text.
    ("srcA", "alpha beta gamma delta epsilon zeta"),
    ("srcA", "one two three four five six seven"),
    ("srcB", "alpha beta gamma delta epsilon zeta"),
    ("srcB", "eight nine ten eleven twelve"),
    ("srcC", "completely different words entirely here now"),
]


def _py_shingles(text: str, n: int = 3) -> list[str]:
    ws = text.split(" ")
    m = max(len(ws) - (n - 1), 1)
    return [" ".join(ws[i: i + n]) for i in range(m)]


def _py_sig(texts: list[str]) -> list[int]:
    p = INCR_MINHASH_P
    sig = [p] * len(INCR_MINHASH_PERMS)
    for t in texts:
        for sh in _py_shingles(t):
            h = int(hashlib.md5(sh.encode()).hexdigest()[:15], 16) % p
            for i, (a, b) in enumerate(INCR_MINHASH_PERMS):
                sig[i] = min(sig[i], (a * h + b) % p)
    return sig


def _py_overlap() -> dict[tuple[str, str], float]:
    by_src: dict[str, list[str]] = {}
    for s, t in DOCS:
        by_src.setdefault(s, []).append(t)
    sigs = {s: _py_sig(ts) for s, ts in by_src.items()}
    out = {}
    names = sorted(sigs)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            out[(a, b)] = agree / len(INCR_MINHASH_PERMS)
    return out


def test_matches_python_replication(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["source", "text"])
    )
    got = {
        (r.src_a, r.src_b): r.est_jaccard
        for r in source_overlap(df).collect()
    }
    want = _py_overlap()
    assert got == want
    # structural sanity: 3 sources -> 3 ordered pairs, src_a < src_b
    assert len(got) == 3
    assert all(a < b for a, b in got)
    # the sharing pair must overlap more than either does with srcC
    assert want[("srcA", "srcB")] > want[("srcA", "srcC")]
    assert want[("srcA", "srcB")] > want[("srcB", "srcC")]


def test_identical_sources_full_overlap(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["x", "x", "y", "y"],
                "text": [DOCS[0][1], DOCS[1][1]] * 2,
            }
        )
    )
    rows = source_overlap(df).collect()
    assert len(rows) == 1
    assert rows[0].est_jaccard == 1.0
