"""Round-2 training-pipeline queries vs a pure-Python recompute.

Each query already has a DuckDB oracle in __spark_entry__; these tests add
a THIRD independent implementation (plain Python/hashlib) so correctness
does not rest on two SQL engines sharing a quirk.  Runs on the driver's
sf0.001 parquet.
"""

import hashlib
import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="driver testdata absent"
)


def _docs_pdf():
    return duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).df()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_stratified_sample_matches_python(spark):
    out = entry_mod.q_stratified_sample(spark, SF_DIR).toPandas()
    got = {(int(r.doc_id), r.lang, int(r.u)) for r in out.itertuples()}
    want = set()
    for r in _docs_pdf().itertuples():
        u = _h60(f"{int(r.doc_id)}:sample") % entry_mod._SAMPLE_MOD
        thr = entry_mod._SAMPLE_THRESH.get(r.lang, entry_mod._SAMPLE_DEFAULT)
        if u < thr:
            want.add((int(r.doc_id), r.lang, u))
    assert got == want and len(want) > 0


def _grams(text: str, n: int) -> set[int]:
    ws = text.split(" ")
    hi = max(len(ws) - (n - 1), 1)
    return {_h60(" ".join(ws[i : i + n])) for i in range(hi)}


def test_decontaminate_matches_python(spark):
    out = entry_mod.q_decontaminate(spark, SF_DIR).toPandas()
    docs = _docs_pdf()
    n = entry_mod._DECON_N
    gram_sets = {int(r.doc_id): _grams(r.text, n) for r in docs.itertuples()}
    bench = set().union(*(g for d, g in gram_sets.items() if d % 10 == 0))
    want = {}
    for d, g in gram_sets.items():
        if d % 10 != 0 and g & bench:
            want[d] = (len(g & bench), len(g))
    got = {int(r.doc_id): (int(r.n_hits), int(r.n_ngrams)) for r in out.itertuples()}
    assert got == want and len(want) > 0
    for r in out.itertuples():
        d = int(r.doc_id)
        assert abs(r.contam_frac - want[d][0] / want[d][1]) < 1e-6


def test_tfidf_topk_matches_python(spark):
    out = entry_mod.q_tfidf_topk(spark, SF_DIR).toPandas()
    docs = _docs_pdf()
    tf, df = {}, {}
    for r in docs.itertuples():
        d = int(r.doc_id)
        tf[d] = {}
        for w in r.text.split(" "):
            tf[d][w] = tf[d].get(w, 0) + 1
        for w in set(tf[d]):
            df[w] = df.get(w, 0) + 1
    n_docs = float(len(docs))

    def round6(x):  # HALF_UP like Spark/DuckDB ROUND (scores are >= 0)
        return math.floor(x * 1e6 + 0.5) / 1e6

    want = {}
    for d, terms in tf.items():
        scored = sorted(
            ((-round6(c * math.log(n_docs / df[w])), w) for w, c in terms.items())
        )[:3]
        want[d] = [(w, -s) for s, w in scored]
    got = {}
    for r in out.sort_values(["doc_id", "rank"]).itertuples():
        got.setdefault(int(r.doc_id), []).append((r.term, r.tfidf))
    assert set(got) == set(want)
    for d in want:
        assert [w for w, _ in got[d]] == [w for w, _ in want[d]], d
        for (gw, gs), (_, ws) in zip(got[d], want[d]):
            assert abs(gs - ws) < 2e-6, (d, gw, gs, ws)


def test_ann_int8_matches_python(spark):
    out = entry_mod.q_ann_int8(spark, SF_DIR).toPandas()
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' ORDER BY vec_id"
    ).df()
    vecs = {int(r.vec_id): [float(x) for x in r.embedding] for r in emb.itertuples()}
    tables = [
        entry_mod._lsh_planes(t) for t in range(entry_mod._LSH_TABLES)
    ]

    def bucket(v, planes):
        b = 0
        for p, row in enumerate(planes):
            # x * +/-1.0 exactly like the Spark zip_with fold (an exact
            # sign flip), accumulated left-to-right
            acc = 0.0
            for w, x in zip(row, v):
                acc = acc + x * float(w)
            if acc > 0:
                b += 1 << p
        return b

    dim = len(next(iter(vecs.values())))
    scale = [max(max(abs(v[j]) for v in vecs.values()), 1e-30) for j in range(dim)]
    codes = {
        d: [math.floor(v[j] / scale[j] * 127.0) for j in range(dim)]
        for d, v in vecs.items()
    }
    buckets = {
        d: [bucket(v, pl) for pl in tables] for d, v in vecs.items()
    }

    def fold_cos(a, b):  # sequential folds, matching F.aggregate exactly
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    want_rows = []
    for qid in sorted(d for d in vecs if d < 50):
        # r9 multiprobe: the query also probes every bucket within
        # Hamming distance 1 of its key, so a candidate co-buckets iff
        # the keys differ in at most one bit in ANY table
        cand = [
            d
            for d in vecs
            if d != qid
            and any(
                bin(buckets[d][t] ^ buckets[qid][t]).count("1") <= 1
                for t in range(entry_mod._LSH_TABLES)
            )
        ]
        qs = {d: sum(x * y for x, y in zip(codes[qid], codes[d])) for d in cand}
        top10 = sorted(cand, key=lambda d: (-qs[d], d))[:10]
        cos = {d: math.floor(fold_cos(vecs[qid], vecs[d]) * 1e6 + 0.5) / 1e6 if fold_cos(vecs[qid], vecs[d]) >= 0 else -(math.floor(-fold_cos(vecs[qid], vecs[d]) * 1e6 + 0.5) / 1e6) for d in top10}
        top3 = sorted(top10, key=lambda d: (-cos[d], d))[:3]
        for rank, d in enumerate(top3, 1):
            want_rows.append((qid, d, qs[d], rank))
    got_rows = [
        (int(r.qid), int(r.vec_id), int(r.qscore), int(r.rank))
        for r in out.sort_values(["qid", "rank"]).itertuples()
    ]
    assert sorted(got_rows) == sorted(want_rows)
