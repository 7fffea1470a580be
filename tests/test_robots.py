"""Robots Exclusion Protocol engine (operators/robots.py).

Verdicts are pinned against a pure-Python RFC 9309 reference (group
combination, longest-match, allow-wins-ties, * wildcard, $ anchor)
over adversarial files, plus structural parse tests.
"""

import re

import pandas as pd
import pytest

from pandas_sigproc_spark.operators.robots import (
    parse_robots,
    robots_verdicts,
)

ROBOTS_A = """# comment-only line
User-agent: SparkBot
Disallow: /private/
Allow: /private/ok/

User-agent: *
Disallow: /tmp/
Disallow: /*.json$
Allow: /tmp/keep
"""

ROBOTS_B = """User-agent: otherbot
User-agent: *
Disallow: /all/
Allow: /all/open*page
Crawl-delay: 10
Unknown-directive: x

User-agent: *
Disallow: /second-group/
"""

ROBOTS_C = """User-agent: sparkbot
Disallow:
"""  # empty Disallow = allow everything for sparkbot


# --- pure-Python RFC 9309 reference ------------------------------------------


def _ref_parse(txt):
    groups = []  # [(set(agents), [(rule, path)])]
    cur_agents, cur_rules, in_rules = [], [], False
    for raw in txt.split("\n"):
        m = re.match(r"^\s*([A-Za-z-]+)\s*:(.*)$", raw)
        if not m:
            continue
        kind = m.group(1).lower()
        val = re.sub(r"#.*$", "", m.group(2)).strip()
        if kind == "user-agent":
            if in_rules:
                groups.append((set(cur_agents), cur_rules))
                cur_agents, cur_rules, in_rules = [], [], False
            cur_agents.append(val.lower())
        elif kind in ("allow", "disallow"):
            in_rules = True
            if val:
                cur_rules.append((kind, val))
    if cur_agents:
        groups.append((set(cur_agents), cur_rules))
    return groups


def _rule_matches(rule_path, path):
    anchored = rule_path.endswith("$")
    body = rule_path[:-1] if anchored else rule_path
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    rx = "^" + rx + ("$" if anchored else "")
    return re.match(rx, path) is not None


def _ref_verdict(txt, agent, path):
    groups = _ref_parse(txt)
    exact = [g for g in groups if agent.lower() in g[0]]
    chosen = exact if exact else [g for g in groups if "*" in g[0]]
    best = None  # (len, is_allow, path)
    for _, rules in chosen:
        for rule, rp in rules:
            if _rule_matches(rp, path):
                key = (len(rp.encode()), 1 if rule == "allow" else 0, rp)
                if best is None or key > best:
                    best = key
    if best is None:
        return True, None
    return best[1] == 1, best[2]


PATHS = [
    "/",
    "/private/doc",
    "/private/ok/doc",
    "/tmp/x",
    "/tmp/keeper",
    "/data/file.json",
    "/data/file.json.bak",
    "/all/page",
    "/all/openXpage",
    "/all/open/deep/page",
    "/second-group/x",
    "/anything",
]


def _spark_verdicts(spark, robots_map, agent, paths):
    robots = spark.createDataFrame(
        pd.DataFrame(
            {"host": list(robots_map), "robots_txt": list(robots_map.values())}
        )
    )
    rules = parse_robots(robots)
    pages = spark.createDataFrame(
        pd.DataFrame(
            [
                (h, p, i)
                for i, (h, p) in enumerate(
                    (h, p) for h in robots_map for p in paths
                )
            ],
            columns=["host", "path", "page_id"],
        )
    )
    out = robots_verdicts(pages, rules, agent=agent)
    return {
        (r["host"], r["path"]): (r["allowed"], r["matched_path"])
        for r in out.collect()
    }


def test_verdicts_match_reference(spark):
    robots_map = {"a.example": ROBOTS_A, "b.example": ROBOTS_B, "c.example": ROBOTS_C}
    for agent in ("SparkBot", "nobody"):
        got = _spark_verdicts(spark, robots_map, agent, PATHS)
        for host, txt in robots_map.items():
            for p in PATHS:
                want_allowed, want_path = _ref_verdict(txt, agent, p)
                g_allowed, g_path = got[(host, p)]
                assert g_allowed == want_allowed, (
                    f"{agent} {host} {p}: got {g_allowed}, want {want_allowed}"
                )
                assert g_path == want_path, (
                    f"{agent} {host} {p}: matched {g_path}, want {want_path}"
                )


def test_specific_agent_group_excludes_star_rules(spark):
    # SparkBot matches its own group: /tmp/* (a *-group rule) is ALLOWED
    got = _spark_verdicts(spark, {"a.example": ROBOTS_A}, "sparkbot", ["/tmp/x"])
    assert got[("a.example", "/tmp/x")][0] is True


def test_allow_wins_longest_match(spark):
    got = _spark_verdicts(
        spark, {"a.example": ROBOTS_A}, "SparkBot",
        ["/private/doc", "/private/ok/doc"],
    )
    assert got[("a.example", "/private/doc")] == (False, "/private/")
    assert got[("a.example", "/private/ok/doc")] == (True, "/private/ok/")


def test_dollar_anchor(spark):
    got = _spark_verdicts(
        spark, {"a.example": ROBOTS_A}, "nobody",
        ["/data/file.json", "/data/file.json.bak"],
    )
    assert got[("a.example", "/data/file.json")][0] is False
    assert got[("a.example", "/data/file.json.bak")][0] is True


def test_multi_agent_group_and_repeated_star_groups_combine(spark):
    got = _spark_verdicts(
        spark, {"b.example": ROBOTS_B}, "anyone",
        ["/all/page", "/all/openXpage", "/second-group/x", "/"],
    )
    assert got[("b.example", "/all/page")][0] is False
    assert got[("b.example", "/all/openXpage")][0] is True  # wildcard allow
    assert got[("b.example", "/second-group/x")][0] is False  # 2nd * group
    assert got[("b.example", "/")][0] is True


def test_empty_disallow_allows_everything(spark):
    got = _spark_verdicts(
        spark, {"c.example": ROBOTS_C}, "sparkbot", ["/anything", "/"]
    )
    assert all(v[0] for v in got.values())


def test_host_without_robots_is_allowed(spark):
    robots = spark.createDataFrame(
        pd.DataFrame({"host": ["x.example"], "robots_txt": [ROBOTS_A]})
    )
    pages = spark.createDataFrame(
        pd.DataFrame({"host": ["fresh.example"], "path": ["/p"], "page_id": [0]})
    )
    out = robots_verdicts(pages, parse_robots(robots)).collect()
    assert out[0]["allowed"] is True and out[0]["matched_rule"] is None


def test_like_metachars_in_rule_paths_are_literal(spark):
    # %, _ and \ inside a rule path must match literally, not as LIKE
    # wildcards (the pattern compiler escapes them).
    txt = "User-agent: *\nDisallow: /a%b_c\\d/\n"
    got = _spark_verdicts(
        spark, {"m.example": txt}, "nobody",
        ["/a%b_c\\d/x", "/aXbYcZd/x"],
    )
    assert got[("m.example", "/a%b_c\\d/x")][0] is False
    assert got[("m.example", "/aXbYcZd/x")][0] is True


def test_robots_verdicts_stream_safe(spark, tmp_path):
    """robots_verdicts on a PAGE STREAM with static rules is a
    stream-static join + stateless expressions — replayed-stream
    output == batch (the crawl-tier stream-safety contract).  This is
    the production shape: the rules table refreshes slowly (robots
    re-fetch cadence), pages arrive continuously."""
    import os

    robots = spark.createDataFrame(
        pd.DataFrame({"host": ["a.example"], "robots_txt": [ROBOTS_A]})
    )
    rules = parse_robots(robots)
    pages_pdf = pd.DataFrame(
        {
            "host": ["a.example"] * 3,
            "path": ["/private/doc", "/private/ok/doc", "/"],
            "page_id": [0, 1, 2],
        }
    )
    schema = "host string, path string, page_id long"
    batch = (
        robots_verdicts(
            spark.createDataFrame(pages_pdf, schema), rules, agent="sparkbot"
        )
        .toPandas()
        .sort_values(["page_id"], ignore_index=True)
    )
    root = str(tmp_path / "robots_stream")
    os.makedirs(root, exist_ok=True)
    pages_pdf.to_parquet(os.path.join(root, "part-000.parquet"), index=False)
    q = (
        robots_verdicts(
            spark.readStream.schema(schema).parquet(root),
            rules,
            agent="sparkbot",
        )
        .writeStream.format("memory")
        .queryName("robots_stream_q")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("select * from robots_stream_q")
        .toPandas()
        .sort_values(["page_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[batch.columns], batch)


# --- review-finding regressions (round-11 second pass) ------------------------


def test_empty_exact_group_shadows_star_denial(spark):
    # RFC 9309 group SELECTION keys on the group's existence: an
    # exact-agent group whose only rule is the allow-all empty
    # Disallow must shadow a deny-all * group, not vanish from the
    # rules table (review finding: the inner join dropped it and the
    # host went fully blocked).
    txt = "User-agent: sparkbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    got = _spark_verdicts(
        spark, {"e.example": txt}, "sparkbot", ["/", "/anything"]
    )
    assert got[("e.example", "/")] == (True, None)
    assert got[("e.example", "/anything")] == (True, None)
    # ...while an unmatched agent still hits the * deny-all
    got2 = _spark_verdicts(spark, {"e.example": txt}, "nobody", ["/x"])
    assert got2[("e.example", "/x")] == (False, "/")


def test_tab_separated_directives(spark):
    # a tab after the colon must strip like a space (F.trim strips
    # only ASCII spaces — review finding: the rule silently never
    # matched and the crawler fetched forbidden paths).
    txt = "User-agent:\tsparkbot\nDisallow:\t/private/\n"
    got = _spark_verdicts(
        spark, {"t.example": txt}, "sparkbot", ["/private/doc", "/ok"]
    )
    assert got[("t.example", "/private/doc")] == (False, "/private/")
    assert got[("t.example", "/ok")] == (True, None)


def test_precedence_counts_octets_not_chars(spark):
    # RFC 9309 longest-match counts rule OCTETS: '/caf\u00e9' is 5
    # chars but 6 UTF-8 octets, so it must beat a 5-octet competitor.
    txt = "User-agent: *\nDisallow: /caf\u00e9\nAllow: /caf*\n"
    # rule lengths: disallow = 6 octets, allow '/caf*' = 5 octets
    got = _spark_verdicts(
        spark, {"u.example": txt}, "nobody", ["/caf\u00e9-menu"]
    )
    assert got[("u.example", "/caf\u00e9-menu")] == (False, "/caf\u00e9")


def test_sitemap_directives_flat_scan(spark):
    from pandas_sigproc_spark.operators.robots import sitemap_directives

    txt = (
        "Sitemap: https://a.example/top.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "Sitemap:\thttps://a.example/inner.xml  \n"
        "Sitemap:\n"  # empty value dropped
        "sitemap: https://a.example/lower.xml\n"  # case-insensitive
    )
    robots = spark.createDataFrame(
        pd.DataFrame({"host": ["a.example"], "robots_txt": [txt]})
    )
    got = sorted(
        r["sitemap_url"] for r in sitemap_directives(robots).collect()
    )
    assert got == [
        "https://a.example/inner.xml",
        "https://a.example/lower.xml",
        "https://a.example/top.xml",
    ]


def test_sitemap_locs_and_kind(spark):
    from pandas_sigproc_spark.operators.webcrawl import (
        sitemap_kind,
        sitemap_locs,
    )

    urlset = (
        '<?xml version="1.0"?><urlset xmlns="x">'
        "<url><loc>\n https://a/1 \n</loc></url>"
        "<url><loc>https://a/2</loc></url></urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>\thttps://a/s.xml\t</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"i": [0, 1, 2], "xml": [urlset, index, "not xml"]})
    )
    rows = {
        r["i"]: (list(r["locs"]), r["kind"])
        for r in df.select(
            "i",
            sitemap_locs("xml").alias("locs"),
            sitemap_kind("xml").alias("kind"),
        ).collect()
    }
    assert rows[0] == (["https://a/1", "https://a/2"], "urlset")
    assert rows[1] == (["https://a/s.xml"], "index")
    assert rows[2] == ([], None)


def test_bom_prefixed_robots_first_group_parses(spark):
    # r13 review finding: a UTF-8 BOM glued to the first User-agent
    # line voided the whole politeness gate for that host.
    txt = "﻿User-agent: *\nDisallow: /"
    df = spark.createDataFrame(
        [("h.example", txt)], "host string, robots_txt string"
    )
    rules = parse_robots(df)
    got = rules.collect()
    assert got, "BOM-prefixed robots.txt parsed to nothing"
    assert any(r["agent"] == "*" and r["rule"] == "disallow" for r in got)
