"""URL canonicalization/dedup (net_spider_spark/pipeline/url.py):
rule-by-rule canonicalization cases, keep-min dedup, host extraction,
and the codegen-only plan pin."""

from pyspark.sql import functions as F

from net_spider_spark.pipeline import url as U


def _canon(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "doc_id long, url string")
    rows = df.select(
        "doc_id", U.canonical_url(F.col("url")).alias("c")
    ).collect()
    return [r["c"] for r in sorted(rows, key=lambda r: r["doc_id"])]


def test_canonicalization_rules(spark):
    got = _canon(spark, [
        "HTTP://WWW.Example.COM:80/Page?b=2&a=1#frag",
        "http://example.com/Page?a=1&b=2",
        "https://Example.com:443/x?utm_source=tw&gclid=1&q=spark",
        "https://example.com/x?q=spark",
        "http://example.com/plain",
        "http://example.com/plain?utm_campaign=only",
        "http://sub.www-like.example.com/keep",   # 'www.' only as prefix
    ])
    assert got[0] == got[1] == "http://example.com/Page?a=1&b=2"
    assert got[2] == got[3] == "https://example.com/x?q=spark"
    # a tracking-only query drops its '?' entirely
    assert got[4] == got[5] == "http://example.com/plain"
    assert got[6] == "http://sub.www-like.example.com/keep"


def test_case_of_path_and_query_is_preserved(spark):
    got = _canon(spark, ["http://A.com/CaseSensitive?Q=Value"])
    assert got[0] == "http://a.com/CaseSensitive?Q=Value"


def test_url_dedup_keep_min(spark):
    df = spark.createDataFrame(
        [
            (1, "http://www.a.com/x?b=2&a=1"),
            (2, "HTTP://A.COM:80/x?a=1&b=2#f"),
            (3, "http://a.com/other"),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in U.url_dedup(df).collect()}
    assert rows[1]["is_dup"] is False and rows[1]["keeper_id"] == 1
    assert rows[2]["is_dup"] is True and rows[2]["keeper_id"] == 1
    assert rows[3]["is_dup"] is False
    assert rows[1]["canonical_url"] == rows[2]["canonical_url"]


def test_host_and_domain_filter(spark):
    df = spark.createDataFrame(
        [
            (1, "http://WWW.Spam.com:80/x"),
            (2, "https://good.org/y"),
        ],
        "doc_id long, url string",
    )
    hosts = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", U.url_host(F.col("url")).alias("h")).collect()
    }
    assert hosts == {1: "spam.com", 2: "good.org"}
    kept = U.domain_filter(df, ["Spam.com"]).collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_plan_stays_in_codegen(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")],
                               "doc_id long, url string")
    plan = (
        U.url_dedup(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_host_quota_keeps_smallest_ids_per_host(spark):
    rows = [(i, f"http://WWW.h{i % 2}.com:80/p/{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = U.host_quota(df, max_per_host=3).collect()
    by_host = {}
    for r in kept:
        by_host.setdefault(r["host"], []).append(r["doc_id"])
    assert {h: sorted(ids) for h, ids in by_host.items()} == {
        "h0.com": [0, 2, 4],
        "h1.com": [1, 3, 5],
    }
    # original columns survive
    assert {f for f in kept[0].asDict()} == {"doc_id", "url", "host"}


def test_sitemap_urls_urlset_and_index(spark):
    urlset = ("<?xml version=\"1.0\"?><urlset>"
              "<url><loc>http://a/1?x=1&amp;y=%3C</loc>"
              "<priority>0.5</priority></url>"
              "<url><loc>\n  http://a/2 </loc></url></urlset>")
    index = ("<sitemapindex><sitemap><loc>http://a/maps/1.xml</loc>"
             "</sitemap></sitemapindex>")
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "<urlset></urlset>")],
        "sitemap_id long, sitemap_xml string",
    )
    rows = U.sitemap_urls(df).collect()
    got = sorted((r["sitemap_id"], r["url"], r["is_index"]) for r in rows)
    assert got == [
        (1, "http://a/1?x=1&y=%3C", False),
        (1, "http://a/2", False),
        (2, "http://a/maps/1.xml", True),
    ]


ROBOTS = """# global banner comment
User-agent: badbot
Disallow: /

User-agent: Googlebot
User-agent: *
Disallow: /private/  # staff only
Allow: /private/ok/
disallow: /tmp
Disallow:
Crawl-delay: 3
"""


def test_robots_rules_groups_agents_comments(spark):
    df = spark.createDataFrame(
        [("a.test", ROBOTS), ("empty.test", "# nothing here")],
        "host string, robots_txt string",
    )
    got = sorted(
        (r["host"], r["allow"], r["path_prefix"])
        for r in U.robots_rules(df, agent="*").collect()
    )
    # badbot group excluded; multi-agent group (Googlebot + *) matched;
    # comment stripped from the prefix; lowercase 'disallow:' header
    # parsed; empty Disallow and Crawl-delay dropped; no rows for the
    # rule-less host.
    assert got == [
        ("a.test", False, "/private/"),
        ("a.test", False, "/tmp"),
        ("a.test", True, "/private/ok/"),
    ]
    # the same file serves the Googlebot group too, and badbot gets its
    # own catch-all.
    assert sorted(
        (r["allow"], r["path_prefix"])
        for r in U.robots_rules(df, agent="googlebot").collect()
    ) == [(False, "/private/"), (False, "/tmp"), (True, "/private/ok/")]
    assert [
        (r["allow"], r["path_prefix"])
        for r in U.robots_rules(df, agent="BADBOT").collect()
    ] == [(False, "/")]


def test_robots_filter_longest_match_wins(spark):
    rules = spark.createDataFrame(
        [
            ("a.test", False, "/private/"),
            ("a.test", True, "/private/ok/"),
            ("a.test", False, "/"),
            ("a.test", True, "/doc"),
        ],
        "host string, allow boolean, path_prefix string",
    )
    urls = spark.createDataFrame(
        [
            (1, "http://a.test/private/x"),
            (2, "http://a.test/private/ok/y"),
            (3, "http://a.test/doc/1?q=2"),     # query kept; /doc allow
                                                 # still longest match
            (4, "http://a.test/other"),          # '/' disallow catches
            (5, "http://b.test/anything"),       # no rules -> allowed
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in U.robots_filter(urls, rules).collect()
    }
    assert got == {1: False, 2: True, 3: True, 4: False, 5: True}


def test_robots_filter_allow_wins_length_tie(spark):
    rules = spark.createDataFrame(
        [("a.test", False, "/p/"), ("a.test", True, "/p/")],
        "host string, allow boolean, path_prefix string",
    )
    urls = spark.createDataFrame(
        [(1, "http://a.test/p/x")], "doc_id long, url string"
    )
    assert U.robots_filter(urls, rules).collect()[0]["allowed"] is True


def test_extract_links_and_host_graph(spark):
    pages = spark.createDataFrame(
        [
            (1, '<a href="http://b.test/x">b</a><a href="/rel">r</a>'
                '<a href="HTTPS://WWW.C.test:443/y">c</a>'
                '<a href="mailto:x@y.z">m</a>',
             "http://www.a.test:80/page"),
            (2, "no links at all", "http://a.test/2"),
        ],
        "doc_id long, html string, url string",
    )
    links = U.extract_links(pages).collect()
    got = sorted((r["doc_id"], r["src_host"], r["dst_host"]) for r in links)
    # absolute -> canonical host, relative + mailto -> same host, no
    # rows for the link-less page
    assert got == sorted(
        [(1, "a.test", "b.test"), (1, "a.test", "a.test"),
         (1, "a.test", "c.test"), (1, "a.test", "a.test")]
    )
    g = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in U.host_link_graph(U.extract_links(pages)).collect()
    }
    assert g == {
        ("a.test", "a.test"): 2,
        ("a.test", "b.test"): 1,
        ("a.test", "c.test"): 1,
    }
    no_self = U.host_link_graph(
        U.extract_links(pages), keep_self_loops=False
    ).collect()
    assert ("a.test", "a.test") not in {
        (r["src_host"], r["dst_host"]) for r in no_self
    }


def test_robots_filter_rfc9309_wildcards(spark):
    # RFC 9309 pattern syntax: '*' spans any octets, trailing '$'
    # anchors the end, specificity is raw-pattern octet length, a URL
    # with no path component matches as '/', and patterns match
    # PATH + QUERY (google/robotstxt GetPathParamsQuery: only the
    # fragment is stripped) — so a $ anchor must NOT match through a
    # query string and a /*?sid= rule must catch tracking URLs.
    rules = spark.createDataFrame(
        [
            ("a.test", False, "/*.json$"),
            ("a.test", False, "/sea*rch$"),
            ("a.test", True, "/data/pub*"),
            ("a.test", False, "/"),
            ("c.test", False, "/sea*rch$"),
            ("c.test", False, "/*?sid="),
        ],
        "host string, allow boolean, path_prefix string",
    )
    urls = spark.createDataFrame(
        [
            (1, "http://a.test/data/x.json"),       # *.json$ -> deny
            (2, "http://a.test/data/x.jsonx"),      # anchor holds -> '/' only
            (3, "http://a.test/search?q=1"),        # '/' -> deny ($ rule
                                                    # does NOT match: query
                                                    # kept, no 'rch' suffix)
            (4, "http://a.test/data/pub/x.json"),   # allow (10) beats deny (8)
            (5, "http://a.test"),                   # bare authority = '/'
            (6, "http://b.test/anything"),          # no rules -> allow
            (7, "http://c.test/search?q=1"),        # anchor fails on kept
                                                    # query -> allow
            (8, "http://c.test/sea/x/rch"),         # mid-* + $ -> deny
            (9, "http://c.test/item?sid=4"),        # query-targeting
                                                    # wildcard -> deny
            (10, "http://c.test/item?x=1"),         # other query -> allow
            (11, "http://c.test?sid=3"),            # no path + query =
                                                    # '/?sid=3' -> deny
            (12, "http://c.test/search#rch"),       # fragment stripped:
                                                    # '/search' ends rch ->
                                                    # deny
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in U.robots_filter(urls, rules).collect()
    }
    assert got == {1: False, 2: False, 3: False, 4: True, 5: False,
                   6: True, 7: True, 8: False, 9: False, 10: True,
                   11: False, 12: False}


def test_robots_filter_escapes_like_metachars(spark):
    # literal '%' and '_' in rule paths must not act as LIKE wildcards
    rules = spark.createDataFrame(
        [("a.test", False, "/100%_off")],
        "host string, allow boolean, path_prefix string",
    )
    urls = spark.createDataFrame(
        [(1, "http://a.test/100%_off/sale"), (2, "http://a.test/100xyoff")],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in U.robots_filter(urls, rules).collect()
    }
    assert got == {1: False, 2: True}
