"""bloom_sizing: the (n_grams, target_fp) -> (m_bits, k) calculator
behind Bloom decontamination (r7 advice item 8).

Two layers: formula pins (power-of-two m, clamped k, realized-rate
guarantee across a sizing table) and a MEASURED false-positive run on
the real Spark probe path — bitmap built from one gram population,
probed with a disjoint one, flagged fraction must come in under the
target the calculator promised."""

import pytest
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators import bloom_sizing, build_bloom_bitmap
from pandas_sigproc_spark.operators.curation import (
    BLOOM_K,
    BLOOM_M_BITS,
    bloom_probe,
)

SIZING_TABLE = [
    (1_000, 1e-2),
    (1_000, 1e-3),
    (25_000, 1e-4),   # the shipped-default suite size
    (250_000, 1e-4),
    (1_000_000, 1e-4),
    (10_000_000, 1e-5),
]


def test_sizing_meets_target_across_table():
    for n, target in SIZING_TABLE:
        m, k, fp = bloom_sizing(n, target)
        assert m & (m - 1) == 0, f"m={m} not a power of two"
        assert m % 32 == 0
        assert 1 <= k <= 8
        assert fp <= target, f"(n={n}, target={target}) realized fp={fp}"


def test_sizing_monotone_in_items():
    sizes = [bloom_sizing(n, 1e-4).m_bits for n in (10_000, 100_000, 1_000_000)]
    assert sizes == sorted(sizes) and sizes[0] < sizes[-1]


def test_default_constants_within_calculator_budget():
    # The shipped defaults (m=2^20, k=4) must satisfy the same 1e-4
    # target the calculator would enforce for the sf0.1 suite size —
    # realized fp at n=25k grams: (1 - e^{-kn/m})^k ~ 7e-5.
    import math

    n = 25_000
    fp = (1.0 - math.exp(-BLOOM_K * n / BLOOM_M_BITS)) ** BLOOM_K
    assert fp <= 1e-4
    m, k, sized_fp = bloom_sizing(n, 1e-4)
    assert m == BLOOM_M_BITS
    assert sized_fp <= 1e-4


def test_sizing_rejects_bad_inputs():
    with pytest.raises(ValueError):
        bloom_sizing(0, 1e-4)
    with pytest.raises(ValueError):
        bloom_sizing(100, 0.0)
    with pytest.raises(ValueError):
        bloom_sizing(10_000_000, 1e-12, max_m_bits=1 << 20)


def test_measured_fp_below_target_on_real_probe(spark):
    """End-to-end on the real operators: size for the bench gram count,
    build the bitmap distributed, probe a DISJOINT corpus, and pin the
    measured per-gram FP under the calculator's target (every flag on a
    disjoint corpus is by construction a false positive)."""
    target = 1e-2
    n_bench_words, gram_n = 2_004, 5
    n_bench_grams = n_bench_words - gram_n + 1
    m, k, predicted = bloom_sizing(n_bench_grams, target)
    assert predicted <= target

    bench_text = " ".join(f"b{i}" for i in range(n_bench_words))
    bench = spark.createDataFrame(
        [(0, bench_text)], "doc_id long, text string"
    )
    from pandas_sigproc_spark.operators import text as T

    gh = (
        bench.select(T.gram_hash_expr(gram_n).alias("gs"))
        .select(F.explode("gs").alias("h"))
        .distinct()
    )
    bitmap = build_bloom_bitmap(gh, m_bits=m, k=k)
    assert len(bitmap) == m // 32

    train = spark.createDataFrame(
        [
            (d, " ".join(f"t{d}x{i}" for i in range(204)))
            for d in range(100)
        ],
        "doc_id long, text string",
    )
    probed = bloom_probe(train, bitmap, n=gram_n, m_bits=m, k=k).agg(
        F.sum("n_flagged").alias("fp"), F.sum("n_ngrams").alias("n")
    ).collect()[0]
    assert probed["n"] == 100 * 200
    measured = probed["fp"] / probed["n"]
    assert measured <= target, (
        f"measured FP {measured} (={probed['fp']}/{probed['n']}) above "
        f"target {target}; predicted {predicted}"
    )


def test_sized_decontaminate_matches_exact_join(spark):
    """The one-call sized path (bloom_decontaminate: count suite grams
    -> bloom_sizing -> build -> probe) reproduces the exact broadcast-
    join decontamination answer on the real sf0.01 corpus — the
    calculator's output proven IN-PLAN, not just in isolation.  Bloom
    guarantees no false negatives, so per doc n_flagged >= exact
    overlap always; equality everywhere means zero realized FP at the
    sized (m, k)."""
    from pandas_sigproc_spark.operators import bloom_decontaminate
    from pandas_sigproc_spark.operators import text as T

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    bench_docs = docs.filter(F.col("doc_id") % 10 == 0)
    train_docs = docs.filter(F.col("doc_id") % 10 != 0)

    # target_fp=1e-6: expected false grams over this ~10^5-gram corpus
    # ~1e-3 << 1, so the sized bitmap reproduces the exact answer
    # bit-for-bit (at 1e-4 the calculator legitimately admits a few
    # false-positive GRAMS — that looser contract is pinned by
    # test_measured_fp_below_target_on_real_probe above).
    probe = bloom_decontaminate(train_docs, bench_docs, 5, target_fp=1e-6)
    got = {
        int(r.doc_id): int(r.n_flagged)
        for r in probe.filter(F.col("n_flagged") > 0).collect()
    }

    bench = (
        bench_docs.select(T.gram_hash_expr(5).alias("gs"))
        .select(F.explode("gs").alias("h"))
        .distinct()
    )
    train = train_docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(T.gram_hash_expr(5)).alias("h"),
    )
    exact = {
        int(r.doc_id): int(r.n)
        for r in train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert exact, "slice produced no contaminated docs — test is vacuous"
    # the Bloom guarantee first (a false NEGATIVE is a broken filter,
    # not a sizing choice), then full equality at the sized (m, k)
    missing = {d: n for d, n in exact.items() if got.get(d, 0) < n}
    assert not missing, f"false negatives (broken filter): {missing}"
    assert got == exact


def test_sizing_rejects_invalid_max_m_bits():
    with pytest.raises(ValueError, match="power of two"):
        bloom_sizing(1000, 1e-3, max_m_bits=10**9)  # not a power of two
    with pytest.raises(ValueError, match="power of two"):
        bloom_sizing(1000, 1e-3, max_m_bits=16)  # below one word


def test_sizing_property_sweep():
    """Property sweep (hypothesis-style deterministic grid): for every
    (n_items, target_fp) across seven orders of magnitude, the realized
    rate meets the target, m stays a whole power-of-two word multiple,
    and k respects the probe-cost clamp."""
    import itertools

    ns = [1, 7, 100, 3_001, 50_000, 777_777, 12_345_678]
    ps = [0.3, 0.05, 1e-2, 1e-3, 1e-4, 1e-6]
    for n, p in itertools.product(ns, ps):
        m, k, fp = bloom_sizing(n, p)
        assert fp <= p, (n, p, m, k, fp)
        assert m & (m - 1) == 0 and m % 32 == 0, (n, p, m)
        assert 1 <= k <= 8, (n, p, k)
        # monotone sanity: the bitmap is never absurdly oversized —
        # one extra doubling past the first passing size at this k
        if m > 32:
            k_half = min(8, max(1, round(m / 2 / n * 0.6931471805599453)))
            fp_half = (1.0 - 2.718281828459045 ** (-k_half * n / (m / 2))) ** k_half
            assert fp_half > p or m == 32, (
                f"m={m} overshoots: m/2 already met target for n={n}, p={p}"
            )
