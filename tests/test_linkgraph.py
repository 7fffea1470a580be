"""Link extraction (html_links) + PageRank (operators/linkgraph.py)."""

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.linkgraph import pagerank
from pandas_sigproc_spark.operators.webcrawl import html_links


def test_html_links_extracts_both_quote_styles(spark):
    html = (
        '<p><a href="http://a.b/x">one</a>'
        "<a class='k' href='http://c.d/y'>two</a>"
        '<a data-href="http://NOT.this/z">no real href</a>'
        "<A\n HREF=\"http://e.f/g\">case+newline</A>"
        "<a name=anchor>no href at all</a></p>"
    )
    df = spark.createDataFrame(pd.DataFrame({"h": [html]}))
    got = df.select(html_links("h").alias("l")).collect()[0].l
    assert got == ["http://a.b/x", "http://e.f/g", "http://c.d/y"]


def test_html_links_duckdb_replay(spark):
    import duckdb

    from pandas_sigproc_spark.operators.webcrawl import _HREF_DQ, _HREF_SQ

    htmls = [
        '<a href="u1">x</a> text <a href=\'u2\'>y</a>',
        "no links here",
        '<a\thref="u3">tab</a>',
    ]
    df = spark.createDataFrame(pd.DataFrame({"h": htmls}))
    got = [r.l for r in df.select(html_links("h").alias("l")).collect()]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"h": htmls}))
    dq = _HREF_DQ.replace("'", "''")
    sq = _HREF_SQ.replace("'", "''")
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT regexp_extract_all(h, '{dq}', 1) "
            f"|| regexp_extract_all(h, '{sq}', 1) FROM t"
        ).fetchall()
    ]
    assert got == duck


def _py_pagerank(edges, iterations=5, d=0.85):
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out = {}
    for u, _ in edges:
        out[u] = out.get(u, 0) + 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {}
        for u, v in edges:
            contrib[v] = contrib.get(v, 0.0) + pr[u] / out[u]
        pr = {v: (1.0 - d) / n + d * contrib.get(v, 0.0) for v in nodes}
    return {v: round(r, 6) for v, r in pr.items()}


def test_pagerank_matches_python_reference(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "d"),  # self-loop + authority hub c
        ("e", "c"),              # e is dangling-in only via out-edge
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, 5).collect()}
    want = _py_pagerank(edges, 5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6)
    # the ordering matches the reference (a funnels c's whole mass)
    assert max(got, key=got.get) == max(want, key=want.get) == "a"


def test_pagerank_duplicate_edges_collapse(spark):
    edges = [("a", "b"), ("a", "b"), ("a", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, 3).collect()}
    want = _py_pagerank([("a", "b"), ("a", "c")], 3)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6)
    assert got["b"] == got["c"]  # a link is a link, not a vote multiplier


def test_pagerank_dangling_mass_leaks(spark):
    # textbook variant: sinks leak mass, total < 1 but ordering holds
    edges = [("a", "b"), ("b", "c")]  # c is a sink
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, 5).collect()}
    want = _py_pagerank(edges, 5)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6)


def test_pagerank_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, 0)
    with pytest.raises(ValueError):
        pagerank(df, 3, damping=1.0)


def test_html_links_quoted_attr_edge_cases(spark):
    # '>' inside an earlier attribute value must not truncate the tag
    # body; href-like text inside OTHER quoted values must not
    # fabricate phantom links (review findings, quoted-attr idiom)
    html = (
        '<a title="a>b" href="http://u.v/">x</a>'
        "<a data-x=' href=\"http://fake/\" ' href='http://real/'>y</a>"
    )
    df = spark.createDataFrame(pd.DataFrame({"h": [html]}))
    got = df.select(html_links("h").alias("l")).collect()[0].l
    assert got == ["http://u.v/", "http://real/"]


def test_pagerank_empty_graph_raises(spark):
    df = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty link graph"):
        pagerank(df, 3)


def test_pagerank_returns_unrounded_ranks(spark):
    # rounding is the gate's concern; the operator must keep full
    # precision (at millions of hosts rank ~ 1/N < 1e-6)
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, 1).collect()}
    want = _py_pagerank([("a", "b")], 1)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
