"""HTML -> text extraction and URL canonicalization (operators/webcrawl.py).

The native tier of the crawl pipeline between WARC payloads and the
text-curation operators.  Alongside the behavior cases, two contracts
are pinned:

- cross-engine replay: the LITERAL same regex patterns produce the
  same extraction in DuckDB (RE2) as in Spark (Java regex) — the
  common-subset claim the gate oracles rely on;
- escape/extract roundtrip (hypothesis): for any text,
  ``html_text(wrap(html_escape(text))) == collapse_ws(text)``.
"""

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pandas_sigproc_spark.operators.webcrawl import (
    _HTML_COMMENT,
    _HTML_ENTITIES,
    _HTML_SCRIPT,
    _HTML_STYLE,
    _HTML_TAG,
    _HTML_WS,
    canonicalize_url,
    html_escape,
    html_text,
)


def _spark_html(spark, htmls):
    df = spark.createDataFrame(pd.DataFrame({"h": htmls}))
    return [
        r["t"] for r in df.select(html_text("h").alias("t")).collect()
    ]


def _spark_canon(spark, urls):
    df = spark.createDataFrame(pd.DataFrame({"u": urls}))
    return [
        r["c"]
        for r in df.select(canonicalize_url("u").alias("c")).collect()
    ]


# ---------------------------------------------------------------------------
# html_text behavior
# ---------------------------------------------------------------------------


def test_html_text_strips_tags_scripts_styles_comments(spark):
    html = (
        "<html><head><title>T</title>"
        "<style type='text/css'>body { color: red }</style>"
        '<script src="x.js">var a = 1 < 2 && "</div>";</script>'
        "</head><body><!-- hidden <b>comment</b> -->"
        "<p>Hello <b>world</b></p></body></html>"
    )
    assert _spark_html(spark, [html]) == ["T Hello world"]


def test_html_text_tolerates_gt_in_quoted_attributes(spark):
    html = '<a href="/x?a>b" title=\'p>q\'>link</a> end'
    assert _spark_html(spark, [html]) == ["link end"]


def test_html_text_decodes_core_entities_only(spark):
    html = "<p>a &lt;tag&gt; &amp;&nbsp;&quot;q&quot; &#39;s&#39; &copy;</p>"
    # &copy; is outside the minimal set and passes through literally
    assert _spark_html(spark, [html]) == ['a <tag> & "q" \'s\' &copy;']


def test_html_text_escaped_entities_survive_as_literals(spark):
    # "&amp;lt;" in the source means the literal text "&lt;" — the
    # decode order (&amp; last) must not double-decode it to "<".
    assert _spark_html(spark, ["<p>&amp;lt;</p>"]) == ["&lt;"]


def test_html_text_collapses_whitespace(spark):
    html = "<div>\n  a\tb\r\n   c  </div>\f d"
    assert _spark_html(spark, [html]) == ["a b c d"]


def test_html_text_case_insensitive_blocks(spark):
    html = "<SCRIPT>drop()</SCRIPT><STYLE>x</STYLE><B>keep</B>"
    assert _spark_html(spark, [html]) == ["keep"]


def test_html_text_multiline_blocks(spark):
    html = "<script>\nline1\nline2\n</script>kept<style>\n.a{}\n</style>"
    assert _spark_html(spark, [html]) == ["kept"]


# ---------------------------------------------------------------------------
# cross-engine replay: the same patterns in DuckDB (RE2)
# ---------------------------------------------------------------------------


def _duckdb_html_text_sql(col: str) -> str:
    """The html_text chain as a DuckDB SQL expression over ``col`` —
    the LITERAL same patterns, global-flag replaces, same entity
    order.  Gate oracles and this test share the construction."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    e = col
    for pat in (_HTML_COMMENT, _HTML_SCRIPT, _HTML_STYLE, _HTML_TAG):
        e = f"regexp_replace({e}, '{esc(pat)}', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        e = f"replace({e}, '{esc(ent)}', '{esc(ch)}')"
    return f"trim(regexp_replace({e}, '{esc(_HTML_WS)}', ' ', 'g'))"


def test_html_text_duckdb_replay_matches_spark(spark):
    htmls = [
        "<p>plain</p>",
        '<a href="/x?a>b">link</a>',
        "<SCRIPT a='1'>j s</SCRIPT>after<style>.c{}</style>",
        "<!-- c --><div>x &amp; y &lt;z&gt;</div>",
        "no markup at all",
        "<p>&amp;lt; stays</p>",
        "a\n\nb\tc",
        "<script>multi\nline</script><p>kept &nbsp; text</p>",
    ]
    got_spark = _spark_html(spark, htmls)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"h": htmls}))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_duckdb_html_text_sql('h')} FROM t"
        ).fetchall()
    ]
    assert got_spark == got_duck


# ---------------------------------------------------------------------------
# escape/extract roundtrip
# ---------------------------------------------------------------------------

_WRAP_PRE = (
    '<html><head><script type="t">var x = 1 < 2;</script></head>'
    "<body><!-- b --><p>"
)
_WRAP_POST = "</p></body></html>"


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                exclude_characters="\x0b\x00",
                exclude_categories=("Cs", "Cc"),
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_escape_wrap_extract_roundtrip(spark_global, texts):
    import re

    df = spark_global.createDataFrame(pd.DataFrame({"x": texts}))
    wrapped = F.concat(
        F.lit(_WRAP_PRE), html_escape("x"), F.lit(_WRAP_POST)
    )
    got = [
        r["t"]
        for r in df.select(html_text(wrapped).alias("t")).collect()
    ]
    # strip ASCII spaces only: the operator trims with Spark/DuckDB
    # trim(), which removes ' ' — Python str.strip() would also strip
    # Unicode whitespace like NBSP and over-claim
    want = [re.sub(r"[ \t\r\n\f]+", " ", t).strip(" ") for t in texts]
    assert got == want


@pytest.fixture(scope="module")
def spark_global(spark):
    # hypothesis can't take a function-scoped fixture; rebind the
    # session fixture at module scope.
    return spark


# ---------------------------------------------------------------------------
# canonicalize_url
# ---------------------------------------------------------------------------


def test_canonicalize_url_cases(spark):
    cases = {
        # scheme+host lowercase, default port, tracking strip, sort
        "HTTP://WWW.Example.COM:80/Page/7?utm_source=f&b=2&a=1#frag":
            "http://www.example.com/Page/7?a=1&b=2",
        # https default port + param sort
        "https://Host.org:443/a/b?z=1&y=2&x=3": "https://host.org/a/b?x=3&y=2&z=1",
        # no query, fragment containing '?'
        "https://cdn.net/file#sec?notaquery": "https://cdn.net/file",
        # empty path -> '/', all params tracking -> query dropped
        "http://site.io?gclid=123&ref=tw": "http://site.io/",
        # already canonical is a fixed point
        "http://a.b/c?d=1": "http://a.b/c?d=1",
        # non-default port kept; path case kept
        "http://A.B:8080/Mixed/Case": "http://a.b:8080/Mixed/Case",
        # valueless tracking param; ref_src; msclkid
        "https://x.y/p?ref&k=v&msclkid=1&ref_src=z": "https://x.y/p?k=v",
        # 'refresh=1' is NOT a tracking param (prefix must not overmatch)
        "https://x.y/p?refresh=1": "https://x.y/p?refresh=1",
    }
    urls = list(cases)
    assert _spark_canon(spark, urls) == [cases[u] for u in urls]


def test_canonicalize_url_idempotent(spark):
    urls = [
        "HTTP://WWW.Example.COM:80/Page/7?utm_source=f&b=2&a=1#frag",
        "https://Host.org:443/a/b?z=1&y=2&x=3",
        "http://site.io?gclid=123",
    ]
    once = _spark_canon(spark, urls)
    twice = _spark_canon(spark, once)
    assert once == twice


def test_canonicalize_url_dedup_grouping(spark):
    # the point of the operator: tracking/order/case/fragment variants
    # of one page collapse to a single key
    variants = [
        "http://Example.com/page?b=2&a=1",
        "HTTP://EXAMPLE.COM:80/page?a=1&b=2#top",
        "http://example.com/page?utm_campaign=x&b=2&a=1",
        "http://example.com/other",
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": variants}))
    n = (
        df.select(canonicalize_url("u").alias("c"))
        .groupBy("c")
        .count()
        .collect()
    )
    counts = {r["c"]: r["count"] for r in n}
    assert counts == {
        "http://example.com/page?a=1&b=2": 3,
        "http://example.com/other": 1,
    }


# ---------------------------------------------------------------------------
# stream safety
# ---------------------------------------------------------------------------


def test_crawl_text_operators_are_stream_safe(spark, tmp_path):
    """html_text / canonicalize_url / gopher_rules / zip_members are
    stateless expression trees (or stateless mapInPandas), so they run
    unchanged on a document/shard stream — replayed-stream output ==
    batch for the whole native crawl tier."""
    import os

    from pandas_sigproc_spark.operators.curation import gopher_rules
    from pandas_sigproc_spark.operators.webdataset import zip_members
    from pandas_sigproc_spark.sources.pkzip import encode_zip

    docs_pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "<p>the dog sat with that</p>",
                "<script>x</script><b>of and be</b>",
            ],
            "uri": [
                "HTTP://A.B:80/x?utm_source=1&b=2&a=1#f",
                "https://C.D:443/y?z=1",
            ],
        }
    )
    docs_schema = "doc_id long, text string, uri string"

    def crawl_op(df):
        cleaned = df.select(
            "doc_id",
            canonicalize_url("uri").alias("url_key"),
            html_text("text").alias("text"),
        )
        return gopher_rules(cleaned, min_words=2, keep_cols=("url_key",))

    zip_pdf = pd.DataFrame(
        {
            "shard_id": [0],
            "payload": [
                encode_zip(
                    [{"name": "m.txt", "payload": b"zzz"}], compress=True
                )
            ],
        }
    )
    zip_schema = "shard_id long, payload binary"

    for name, pdf, schema, op, sort_cols in (
        ("crawltext", docs_pdf, docs_schema, crawl_op, ["doc_id"]),
        (
            "zipm",
            zip_pdf,
            zip_schema,
            lambda df: zip_members(df).drop("payload"),
            ["shard_id", "member_idx"],
        ),
    ):
        batch = (
            op(spark.createDataFrame(pdf, schema))
            .toPandas()
            .sort_values(sort_cols, ignore_index=True)
        )
        root = str(tmp_path / f"{name}_stream")
        os.makedirs(root, exist_ok=True)
        pdf.to_parquet(os.path.join(root, "part-000.parquet"), index=False)
        q = (
            op(spark.readStream.schema(schema).parquet(root))
            .writeStream.format("memory")
            .queryName(f"{name}_ingest")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = (
            spark.sql(f"select * from {name}_ingest")
            .toPandas()
            .sort_values(sort_cols, ignore_index=True)
        )
        pd.testing.assert_frame_equal(got[batch.columns], batch)


# ---------------------------------------------------------------------------
# cross-engine edge fixes (round-10 review findings)
# ---------------------------------------------------------------------------


def test_html_text_script_close_with_vertical_tab(spark):
    # close-tag whitespace uses the explicit class, not \s: Java's \s
    # matches \x0B, RE2's does not — neither may treat "</script\x0b>"
    # as a close tag, so the block is NOT terminated there and the
    # parse falls through to tag stripping identically in both engines.
    html = "<script>secret()</script\x0b>after<script>x</script >done"
    got_spark = _spark_html(spark, [html])
    con = duckdb.connect()
    con.register("t_vt", pd.DataFrame({"h": [html]}))
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_duckdb_html_text_sql('h')} FROM t_vt"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_tracking_params_stripped_case_insensitively(spark):
    urls = [
        "http://a.b/p?UTM_Source=mail",
        "http://a.b/p?GCLID=1&k=v",
        "http://a.b/p",
    ]
    assert _spark_canon(spark, urls) == [
        "http://a.b/p",
        "http://a.b/p?k=v",
        "http://a.b/p",
    ]


# -- URL category blocklist (operators/webcrawl.py url_blocklist_filter) ----


def _uri_df(spark, uris):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(uris)), "uri": uris}),
        "doc_id long, uri string",
    )


def test_registrable_domain_cases(spark):
    from pandas_sigproc_spark.operators.webcrawl import (
        registrable_domain_expr,
    )

    cases = {
        "www.news.example.org": "example.org",
        "example.org": "example.org",
        "localhost": "localhost",
        "a.b.spam.co.uk": "spam.co.uk",   # two-level suffix, deep subdomain
        "spam.co.uk": "spam.co.uk",
        "co.uk": "co.uk",                 # the bare suffix is its own tail
        "good.com.au": "good.com.au",
    }
    df = spark.createDataFrame(
        pd.DataFrame({"host": list(cases)}), "host string"
    )
    got = {
        r.host: r.reg
        for r in df.select(
            "host", registrable_domain_expr(F.col("host")).alias("reg")
        ).collect()
    }
    assert got == cases


def test_url_blocklist_filter_verdicts(spark):
    from pandas_sigproc_spark.operators.webcrawl import (
        url_blocklist_filter,
    )

    uris = [
        "http://news.example.org/1",          # clean
        "http://x.badnet.example/2",          # registrable-domain hit
        "http://badnet.example/3",            # bare-domain hit
        "http://tracker.metrics.example/4",   # exact-host hit
        "http://safe.metrics.example/5",      # sibling of exact-host: clean
        "http://a.spam.co.uk/6",              # PSL: registrable spam.co.uk
        "http://good.co.uk/7",                # PSL: clean co.uk site
        "not a url",                          # unparseable: kept
    ]
    rows = {
        r.doc_id: r
        for r in url_blocklist_filter(_uri_df(spark, uris)).collect()
    }
    want = {
        0: (True, None),
        1: (False, "ads"),
        2: (False, "ads"),
        3: (False, "tracking"),
        4: (True, None),
        5: (False, "adult"),
        6: (True, None),
        7: (True, None),
    }
    got = {k: (v.kept, v.category) for k, v in rows.items()}
    assert got == want
    assert rows[7].host is None


def test_url_blocklist_exact_host_beats_domain(spark):
    # when one entry blocks the domain and another the exact host,
    # the exact-host category wins
    from pandas_sigproc_spark.operators.webcrawl import (
        url_blocklist_filter,
    )

    bl = [("site.example", "ads"), ("cdn.site.example", "malware")]
    rows = url_blocklist_filter(
        _uri_df(
            spark,
            ["http://cdn.site.example/1", "http://www.site.example/2"],
        ),
        bl,
    ).collect()
    got = {r.doc_id: r.category for r in rows}
    assert got == {0: "malware", 1: "ads"}


def test_url_blocklist_refuses_duplicate_patterns(spark):
    from pandas_sigproc_spark.operators.webcrawl import (
        url_blocklist_filter,
    )

    with pytest.raises(ValueError, match="duplicate"):
        url_blocklist_filter(
            _uri_df(spark, ["http://a.example/1"]),
            [("x.example", "ads"), ("x.example", "adult")],
        )


def test_registrable_domain_null_host_is_null(spark):
    # NULL host -> NULL registrable (not ''): unparseable URIs must not
    # collapse onto one empty-string group key (round-11 review).
    from pandas_sigproc_spark.operators.webcrawl import url_blocklist_filter

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "uri": ["notaurl", "http://a.b/x"]})
    )
    rows = {r["doc_id"]: r for r in url_blocklist_filter(df).collect()}
    assert rows[0]["host"] is None and rows[0]["registrable"] is None
    assert rows[0]["kept"] is True  # unparseable URIs are kept, not killed
    assert rows[1]["registrable"] == "a.b"
