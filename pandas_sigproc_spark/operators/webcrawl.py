"""Web-crawl archive ingestion — WARC records into relational rows.

The front door of a crawl-derived training corpus: Common-Crawl-style
WARC archives (``sources/warc.py``) become the engine's document rows
here, after which the whole curation stack (dedup, quality, lang-id,
decontamination, PII scrub — operators/curation.py, text.py, dedup.py)
applies unchanged.

- :func:`warc_records` — ``(archive_id, rec_type, uri, date,
  content_type, n_bytes, payload)``: one zero-shuffle ``mapInPandas``
  pass; archives never leave the task that read them, only records
  flow on.
- :func:`warc_documents` — the text-document projection: response
  records decoded as UTF-8 ``(archive_id, uri, n_bytes, text)``,
  feeding the documents-shaped operators directly.

Scale shape: at 100 TB the archive table is (archive_id, payload
binary) from parquet/binaryFile; extraction is embarrassingly parallel
per archive; everything downstream is the already-audited curation
tier.  The gate query ``warc_extract`` roundtrips the sf documents
table through encode_warc (record-gzipped) -> warc_documents and
hash-matches the table itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def warc_records(
    archives: DataFrame,
    *,
    id_col: str = "archive_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Explode WARC archives (plain or record-gzipped) into one row per
    record.  ``on_error="skip"`` drops a corrupt archive instead of
    failing the job (the production setting for third-party crawls;
    default ``"raise"`` — see ``wds_members`` for the contract)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be raise|skip, got {on_error!r}")
    skip = on_error == "skip"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pandas_sigproc_spark.sources.warc import decode_warc

        cols = (
            "archive_id", "rec_type", "uri", "date", "content_type",
            "n_bytes", "payload",
        )
        for pdf in batches:
            for aid, blob in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if pd.isna(aid) or blob is None:
                        # a failed fetch written as NULL: corrupt input
                        # under this function's contract — bytes(None)
                        # used to leak TypeError PAST the skip handler
                        # (a review finding)
                        raise ValueError(
                            "warc_records: NULL archive_id/payload row"
                        )
                    recs = decode_warc(bytes(blob))
                except ValueError:
                    if skip:
                        continue
                    raise
                rows = {c: [] for c in cols}
                for rec in recs:
                    rows["archive_id"].append(int(aid))
                    rows["rec_type"].append(rec["type"])
                    rows["uri"].append(rec["uri"])
                    rows["date"].append(rec["date"])
                    rows["content_type"].append(rec["content_type"])
                    rows["n_bytes"].append(len(rec["payload"]))
                    rows["payload"].append(rec["payload"])
                # one yield PER ARCHIVE: buffering a whole Arrow batch
                # of decompressed archives multiplied worker memory by
                # the batch size x the expansion factor (a review
                # finding) — peak state is now one archive's records
                yield pd.DataFrame(rows)

    return archives.select(id_col, payload_col).mapInPandas(
        run,
        "archive_id long, rec_type string, uri string, date string,"
        " content_type string, n_bytes long, payload binary",
    )


def warc_documents(
    archives: DataFrame,
    *,
    id_col: str = "archive_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Response records as text documents: ``(archive_id, uri, n_bytes,
    text)`` — the decode is a JVM-side binary->string cast (UTF-8), not
    Python."""
    recs = warc_records(
        archives, id_col=id_col, payload_col=payload_col, on_error=on_error
    )
    return recs.filter(F.col("rec_type") == "response").select(
        "archive_id",
        "uri",
        "n_bytes",
        F.col("payload").cast("string").alias("text"),
    )


def url_host(col):
    """The lowercased host of a URL column — Spark's built-in
    ``try_parse_url`` (JVM-side, codegen-friendly; no Python).  try_,
    not parse_: under Spark 4 ANSI a single malformed crawl URI
    ('http://a b/x') aborts the WHOLE job with INVALID_URL; NULL host
    rows drop out of host-keyed joins/groups instead (a review finding
    — url_blocklist_filter had the fix as a one-call-site special case
    while domain_stats/cap_per_domain/linkgraph crashed through this
    shared helper)."""
    return F.lower(F.try_parse_url(col, F.lit("HOST")))


# -- HTML -> text extraction (native, zero-UDF) -----------------------------
#
# Every pattern below is restricted to the Java-regex / RE2 common
# subset (non-capturing groups, char classes, lazy quantifiers, inline
# (?is) flags — no lookaround, no backreferences) so the DuckDB oracle
# replays the extraction with the LITERAL same patterns.  The tag
# pattern tolerates '>' inside quoted attribute values.
_HTML_TAG = "<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
_HTML_COMMENT = "(?s)<!--.*?-->"
# close tags use the explicit whitespace class, NOT \s: Java's \s
# includes \x0B, RE2's does not, so \s here would leak script bodies
# into the oracle's extraction on \x0B-bearing markup.
_HTML_SCRIPT = (
    "(?is)<script\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
    ".*?</script[ \\t\\r\\n\\f]*>"
)
_HTML_STYLE = (
    "(?is)<style\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"
    ".*?</style[ \\t\\r\\n\\f]*>"
)
# explicit class, NOT \s: Java's \s includes \x0B, RE2's does not —
# the explicit class keeps engine semantics identical.
_HTML_WS = "[ \\t\\r\\n\\f]+"
# decode order matters: &amp; LAST, so escaped entities in the source
# text ("&amp;lt;") survive as their literal forms ("&lt;").
_HTML_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def html_text(col):
    """Extract readable text from an HTML column — the boilerplate
    step between WARC response payloads and the text-curation tier.

    Entirely native (a regexp_replace chain, JVM-side, codegen'd —
    zero Python): strip comments, ``<script>``/``<style>`` blocks
    (content included), then all tags (quoted-attribute-aware); decode
    the six core entities (``&amp; &lt; &gt; &quot; &#39; &nbsp;`` —
    the common minimal set; exotic/numeric entities pass through
    literally, documented); collapse runs of whitespace to one space
    and trim.

    Scale shape: a per-row expression tree — no shuffle, no state,
    whole-stage codegen keeps it JVM-side at any corpus size.  Not a
    browser: CDATA sections and a literal ``</script>`` inside a JS
    string are out of scope (they are for most crawl extractors too).
    """
    c = F.regexp_replace(col, _HTML_COMMENT, " ")
    c = F.regexp_replace(c, _HTML_SCRIPT, " ")
    c = F.regexp_replace(c, _HTML_STYLE, " ")
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, _HTML_WS, " "))


# anchor hrefs, both quote styles; Java/RE2 common subset (explicit
# whitespace class, no lookaround).  The tag body uses the same
# quoted-attribute-aware idiom as _HTML_TAG so a '>' inside an earlier
# attribute value cannot truncate the match and href-like text inside
# OTHER quoted values cannot fabricate phantom links.
_HREF_DQ = (
    "(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*?"
    "[ \\t\\r\\n\\f]href[ \\t\\r\\n\\f]*=[ \\t\\r\\n\\f]*\"([^\"]*)\""
)
_HREF_SQ = (
    "(?is)<a\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*?"
    "[ \\t\\r\\n\\f]href[ \\t\\r\\n\\f]*=[ \\t\\r\\n\\f]*'([^']*)'"
)


def html_links(col):
    """All anchor ``href`` values of an HTML column, in document order
    per quote style (double-quoted first, then single-quoted) — the
    crawl-frontier / link-graph extraction step.  A pure
    ``regexp_extract_all`` pair (JVM-side, zero Python), patterns held
    to the Java/RE2 common subset so the DuckDB oracle replays them
    literally.  Hrefs are mostly RELATIVE: resolve them with
    :func:`resolve_url` against the page URL, THEN compose with
    :func:`canonicalize_url` / :func:`url_host` for link-graph edges
    (canonicalize_url maps schemeless input to NULL by design)."""
    return F.concat(
        F.regexp_extract_all(col, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(col, F.lit(_HREF_SQ), F.lit(1)),
    )


def _remove_dot_segments(path_col):
    """RFC 3986 §5.2.4 over an absolute path column, as ONE native
    fold: split on '/', then '.' segments drop, '..' pops (never past
    the root marker — the leading '' of an absolute path), everything
    else appends.  Empty INTERIOR segments ('a//b') are preserved, as
    the RFC's algorithm does.  A path whose original form ends in
    '/', '/.' or '/..' keeps its trailing slash (directory
    semantics)."""
    segs = F.split(path_col, "/")
    folded = F.aggregate(
        segs,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            F.when(
                F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1)
            ).otherwise(acc),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    joined = F.array_join(folded, "/")
    joined = F.when(joined == "", F.lit("/")).otherwise(joined)
    needs_slash = path_col.rlike("(/[.][.]?|/)$")
    return F.when(
        needs_slash & ~joined.rlike("/$"), F.concat(joined, F.lit("/"))
    ).otherwise(joined)


def resolve_url(base, href):
    """Resolve an ``href`` against its page's ``base`` URL — RFC 3986
    §5.2 reference resolution as a pure JVM expression tree (no UDF),
    the step between :func:`html_links` (whose output is mostly
    RELATIVE hrefs) and :func:`canonicalize_url`/:func:`url_host`
    (which need absolute URLs; canonicalize_url maps schemeless input
    to NULL by design).

    Cases: an href with its own scheme passes through (including
    mailto:/javascript: — filter by scheme downstream); ``//host/p``
    takes the base's scheme; ``/p`` is origin-absolute; ``?q`` replaces
    the base's query; ``''``/``#frag`` is a same-document reference
    (returns the base, fragment dropped); anything else merges with the
    base's directory.  Dot segments ('.', '..') are removed by the RFC
    algorithm (a native fold — never past the root); FRAGMENTS ARE
    DROPPED (crawl keys treat them as noise, like canonicalize_url).
    A NULL/schemeless base yields NULL — resolution is undefined.

    Scale shape: per-row expression arithmetic only — zero shuffle,
    zero Python, composes into the link-graph extraction map-side."""
    b = F.col(base) if isinstance(base, str) else base
    h = F.col(href) if isinstance(href, str) else href
    b = F.regexp_replace(b, "#.*", "")  # base fragment is never used
    h = F.regexp_replace(h, "#.*", "")
    b_scheme = F.regexp_extract(b, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    b_rest = F.regexp_replace(b, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    b_auth = F.regexp_extract(b_rest, "^([^/?]*)", 1)
    origin = F.concat(b_scheme, F.lit("://"), b_auth)
    b_path = F.regexp_extract(b_rest, "^[^/?]*([^?]*)", 1)
    b_path = F.when(b_path == "", F.lit("/")).otherwise(b_path)
    b_query = F.regexp_extract(b_rest, "([?].*)$", 1)

    h_path = F.regexp_extract(h, "^([^?]*)", 1)
    h_query = F.regexp_extract(h, "([?].*)$", 1)
    b_dir = F.regexp_replace(b_path, "[^/]*$", "")
    merged = F.concat(b_dir, h_path)

    out = (
        F.when(h.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), h)
        .when(h.rlike("^//"), F.concat(b_scheme, F.lit(":"), h))
        .when(
            h.rlike("^/"),
            F.concat(origin, _remove_dot_segments(h_path), h_query),
        )
        .when(h.rlike("^[?]"), F.concat(origin, b_path, h))
        .when(h == "", F.concat(origin, b_path, b_query))
        .otherwise(
            F.concat(origin, _remove_dot_segments(merged), h_query)
        )
    )
    return F.when(
        b.isNull() | (b_scheme == "") | h.isNull(),
        F.lit(None).cast("string"),
    ).otherwise(out)


def html_escape(col):
    """The inverse seam of :func:`html_text`'s entity decode —
    ``& < >`` escaped for embedding text in markup (native replace
    chain; ``&`` FIRST so the others never double-escape)."""
    c = F.replace(col, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


# -- URL canonicalization (native, zero-UDF) --------------------------------

# the tracking-parameter denylist every crawl pipeline strips before
# URL-level dedup (utm_* per Google's campaign tagging, click ids,
# referral tags); matched against the full "key=value" token,
# case-insensitively — campaign tags are emitted mixed-case in the
# wild, and query case is otherwise preserved.
_TRACKING_PARAM = "(?i)^(?:utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src)(?:=|$)"


def canonicalize_url(col):
    """Canonical form of a URL column, for URL-level deduplication:

    - fragment stripped;
    - scheme and host lowercased (path/query case preserved);
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``,
      ``msclkid``, ``ref``, ``ref_src``);
    - surviving query parameters sorted bytewise (order-insensitive
      dedup); an emptied query loses its ``?``;
    - an empty path becomes ``/``.

    Entirely native (regexp + array expressions, JVM-side).  Two crawl
    records of the same page that differ only in parameter order,
    tracking noise, host case, or fragment map to one key — group on
    the result (or feed it to ``deduplicate``) for URL-level dedup
    before content-level passes."""
    u = F.regexp_replace(col, "(?s)#.*", "")
    scheme = F.lower(
        F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = (
        F.when(
            scheme == "http", F.regexp_replace(hostport, ":80$", "")
        )
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        pathq.contains("?"),
        F.regexp_replace(pathq, "^[^?]*\\?", ""),
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_PARAM),
        )
    )
    qs = F.array_join(params, "&")
    # Schemeless input (relative 'about.html', protocol-relative
    # '//host/x') -> NULL, not '://about.html/': html_links emits
    # mostly relative hrefs and the old garbage keys collapsed
    # distinct pages from different sites onto one dedup key (a review
    # finding).  NULL composes: host-keyed joins and dedup groups drop
    # the row; resolve relative links against their base BEFORE
    # canonicalizing.
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
        )
    )


def domain_stats(
    docs: DataFrame,
    *,
    uri_col: str = "uri",
    text_col: str = "text",
) -> DataFrame:
    """Per-host corpus statistics — the first thing a crawl-curation
    pass inspects: ``(host, n_docs, total_bytes, mean_bytes)``.  One
    partial-aggregated groupBy on the host key; at 100 TB the host
    space is millions of keys with heavy skew toward big sites, which
    a count-based agg absorbs map-side (no per-doc state)."""
    return (
        docs.groupBy(url_host(F.col(uri_col)).alias("host"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.octet_length(text_col)).cast("long").alias("total_bytes"),
            F.round(F.avg(F.octet_length(text_col)), 6).alias("mean_bytes"),
        )
    )


def cap_per_domain(
    docs: DataFrame,
    max_docs: int,
    *,
    uri_col: str = "uri",
    order_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-domain document cap — the RefinedWeb-style
    guard against a single host dominating the corpus: keep the first
    ``max_docs`` documents per host in ``order_col`` order, drop the
    rest.  Output: the input columns + ``host`` + ``kept`` (no rows
    removed — the verdict column composes with the other curation
    filters, which is how ``corpus_curate`` chains them).

    Scale shape: ONE window ranked on the host key.  Host skew is real
    (the biggest site can be 10^6x the median) but the window holds no
    per-row state beyond the running rank, so a hot host costs one
    big — bounded, streaming — task, not a blow-up; the heavy tail is
    exactly what the cap is for."""
    if max_docs < 1:
        raise ValueError("need max_docs >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy(url_host(F.col(uri_col))).orderBy(order_col)
    return docs.withColumn("host", url_host(F.col(uri_col))).withColumn(
        "kept", F.row_number().over(w) <= max_docs
    )


#: Two-level public suffixes the registrable-domain extraction treats
#: as TLD-like ("spam.co.uk" is a site; "co.uk" is not).  A production
#: deployment broadcasts the full Mozilla Public Suffix List the same
#: way; this fixed subset keeps the engine deterministic offline.
TWO_LEVEL_SUFFIXES = (
    "ac.uk", "co.in", "co.jp", "co.uk", "com.au",
    "com.br", "gov.uk", "net.au", "org.au", "org.uk",
)

#: Demo category blocklist: (pattern, category) where pattern matches
#: either the exact host or the registrable domain (so one entry
#: covers every subdomain of a blocked site).  Production pipelines
#: ship curated lists (UT1, RefinedWeb's adult/malware lists) in the
#: same shape.
DEFAULT_BLOCKLIST = (
    ("badnet.example", "ads"),
    ("malware.example", "malware"),
    ("spam.co.uk", "adult"),
    ("tracker.metrics.example", "tracking"),
)


def registrable_domain_expr(host_col) -> Column:
    """The registrable domain of a host column: the last two labels,
    or the last three when the two-label tail is a known two-level
    public suffix (:data:`TWO_LEVEL_SUFFIXES`).  Pure JVM expression
    tree; a one-label host (``localhost``) is its own registrable
    domain; a NULL host yields NULL (not '' — concat_ws over a NULL
    slice would silently collapse every unparseable URI onto one empty
    group key while the host column says NULL, a review finding)."""
    host_in = host_col if isinstance(host_col, Column) else F.col(host_col)
    # FQDN trailing dot ('badnet.example.') would split an empty last
    # label and compute registrable 'example.' — a blocklist bypass by
    # appending a dot (a review finding); strip it first.
    host_col = F.regexp_replace(host_in, "[.]+\\z", "")
    labels = F.split(host_col, "[.]")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.slice(labels, F.greatest(n - 1, F.lit(1)), 2)
    )
    last3 = F.concat_ws(
        ".", F.slice(labels, F.greatest(n - 2, F.lit(1)), 3)
    )
    return F.when(host_in.isNull(), F.lit(None).cast("string")).when(
        (n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3
    ).otherwise(last2)


def url_blocklist_filter(
    docs: DataFrame,
    blocklist=DEFAULT_BLOCKLIST,
    *,
    uri_col: str = "uri",
) -> DataFrame:
    """Category-blocklist URL filter — the RefinedWeb-style adult/
    malware/ads domain gate every production crawl pipeline runs
    before content-level curation.

    Each ``(pattern, category)`` blocklist entry matches documents
    whose exact host OR registrable domain equals ``pattern`` (so
    ``badnet.example`` blocks every subdomain, while an exact-host
    entry like ``tracker.metrics.example`` leaves its siblings
    alone).  Exact-host matches win when both apply.  Output: the
    input columns + ``host``, ``registrable``, ``category`` (null
    when unblocked), ``kept`` (verdict column — rows are flagged,
    not dropped, so the gate composes with the other curation
    filters).  An unparseable URI (null host) is kept.

    Scale shape: two broadcast left joins against the (small,
    curated) blocklist on string keys derived map-side — zero
    shuffle, zero Python; the corpus never moves.
    """
    entries = [(str(p).lower(), str(c)) for p, c in blocklist]
    pats = [p for p, _ in entries]
    if len(set(pats)) != len(pats):
        dupes = sorted({p for p in pats if pats.count(p) > 1})
        raise ValueError(f"duplicate blocklist patterns: {dupes}")
    spark = docs.sparkSession
    bdf = spark.createDataFrame(entries, "pattern string, category string")
    # try_parse_url, not parse_url: a real crawl carries malformed
    # URIs, and the filter's contract is "unparseable -> kept", not a
    # job-killing INVALID_URL (Spark 4 parse_url raises).
    host = F.lower(F.expr(f"try_parse_url({uri_col}, 'HOST')"))
    out = docs.withColumn("host", host).withColumn(
        "registrable", registrable_domain_expr(F.col("host"))
    )
    by_host = bdf.select(
        F.col("pattern").alias("host"),
        F.col("category").alias("_cat_host"),
    )
    by_dom = bdf.select(
        F.col("pattern").alias("registrable"),
        F.col("category").alias("_cat_dom"),
    )
    return (
        out.join(F.broadcast(by_host), "host", "left")
        .join(F.broadcast(by_dom), "registrable", "left")
        .withColumn("category", F.coalesce("_cat_host", "_cat_dom"))
        .withColumn("kept", F.col("category").isNull())
        .drop("_cat_host", "_cat_dom")
    )


__all__ = [
    "DEFAULT_BLOCKLIST",
    "TWO_LEVEL_SUFFIXES",
    "canonicalize_url",
    "html_links",
    "cap_per_domain",
    "domain_stats",
    "html_escape",
    "html_text",
    "registrable_domain_expr",
    "resolve_url",
    "url_blocklist_filter",
    "sitemap_kind",
    "sitemap_locs",
    "url_host",
    "warc_documents",
    "warc_records",
]


def sitemap_locs(col) -> Column:
    """``<loc>`` URL array of a sitemap XML column — works for both
    document sitemaps (``<urlset>``) and sitemap indexes
    (``<sitemapindex>``), whose children are ``<url>``/``<sitemap>``
    elements wrapping a ``<loc>``.  Pattern stays in the Java/RE2
    common subset (the html_links rule: explicit whitespace class, not
    \\s — Java's \\s includes \\x0B, RE2's does not), so the
    DuckDB oracle replays it literally.

    Scale shape: one regexp_extract_all per row — zero shuffle; a
    50k-URL sitemap costs its own bytes inside its own task."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.regexp_extract_all(
        c,
        F.lit(
            "<loc>[ \\t\\r\\n\\f]*([^<]*?)[ \\t\\r\\n\\f]*</loc>"
        ),
        F.lit(1),
    )

    # The sitemap protocol REQUIRES entity-escaped URLs in <loc>, so
    # '&amp;' etc. must decode or every multi-param URL corrupts the
    # crawl frontier (a review finding).  '&amp;' decodes LAST so
    # double-escapes ('&amp;lt;') resolve correctly.
    def _unescape(u):
        for pat, rep in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
        ):
            u = F.replace(u, F.lit(pat), F.lit(rep))
        return u

    return F.transform(raw, _unescape)


def sitemap_kind(col) -> Column:
    """'index' when the XML is a ``<sitemapindex>``, 'urlset' for a
    document sitemap, NULL otherwise."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.contains("<sitemapindex"), F.lit("index"))
        .when(c.contains("<urlset"), F.lit("urlset"))
        .otherwise(F.lit(None).cast("string"))
    )
