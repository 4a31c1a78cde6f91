"""URL canonicalization and URL-level dedup — the first dedup pass of
a crawl pipeline (cheaper than any content hash: two pages with one
canonical URL are the same fetch, no text comparison needed).

Everything is Catalyst string expressions (whole-stage codegen, no
Python), built from regex/array primitives that exist identically in
DuckDB so the canonicalization RULES themselves are oracle-attested:

1. fragment dropped;
2. scheme and authority lowercased (path/query case is significant);
3. a ``www.`` host prefix dropped;
4. explicit default ports ``:80``/``:443`` dropped;
5. tracking parameters (``utm_*``, ``fbclid``, ``gclid``) dropped and
   the surviving query parameters SORTED (param order is almost never
   semantic; sorting merges permutations), ``?`` dropped when none
   survive.

Deliberately not done: scheme merging (http != https), trailing-slash
or %-encoding normalization, IDN — rules whose false-merge risk
outweighs their dedup win. Swap in stricter rules behind the same
column contract if a crawl warrants them.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid)="


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` under the module's rules."""
    u = F.regexp_replace(url, "#.*$", "")
    head = F.lower(F.regexp_extract(u, _AUTHORITY_RE, 0))
    head = F.regexp_replace(head, "://www\\.", "://")
    head = F.regexp_replace(head, ":(80|443)$", "")
    rest = F.regexp_replace(u, _AUTHORITY_RE, "")
    path = F.regexp_replace(rest, "\\?.*$", "")
    qs = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != F.lit(""))
            & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    return F.concat(
        head,
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """The canonical host (lowercased, www./default port dropped)."""
    head = F.lower(F.regexp_extract(url, _AUTHORITY_RE, 0))
    head = F.regexp_replace(head, "://www\\.", "://")
    head = F.regexp_replace(head, ":(80|443)$", "")
    return F.regexp_replace(head, "^[a-z0-9+.-]*://", "")


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup: (id_col, canonical_url, keeper_id,
    is_dup) — the smallest id per canonical URL is the keeper, the
    rest are duplicates. One hash aggregate + a broadcastable
    marking join, the same keep-min shape as ``dedup_exact``."""
    canon = df.select(
        F.col(id_col), canonical_url(F.col(url_col)).alias("canonical_url")
    )
    keepers = canon.groupBy("canonical_url").agg(
        F.min(id_col).alias("keeper_id")
    )
    return canon.join(keepers, "canonical_url").select(
        id_col,
        "canonical_url",
        "keeper_id",
        (F.col(id_col) != F.col("keeper_id")).alias("is_dup"),
    )


def host_quota(
    df: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cap documents per canonical host — the crawl-balance op that
    stops a handful of giant sites dominating a corpus. Deterministic:
    within a host the ``max_per_host`` smallest ids survive. Returns
    the surviving rows of ``df`` plus a ``host`` column.

    One window over (host, id). At 100 TB the sort is per-host and
    hosts are many, so partitions stay balanced unless one host is
    pathological — exactly the rows this op deletes."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy(id_col)
    return (
        df.withColumn("host", url_host(F.col(url_col)))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_per_host)
        .drop("_rk")
    )


def sitemap_urls(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    id_col: str = "sitemap_id",
) -> DataFrame:
    """Explode sitemap XML (sitemaps.org protocol) into its frontier:
    (id_col, url, is_index). ``<loc>`` entries under ``<sitemapindex>``
    are child sitemaps (is_index=true, to be fetched and fed back in);
    under ``<urlset>`` they are page URLs. A regexp extraction, not an
    XML parser — sitemaps are machine-generated and flat, and the
    regex shape keeps the whole frontier expansion in codegen (and
    oracle-portable). ``<loc>`` text is whitespace-trimmed and the five
    predefined XML entities are unescaped (the protocol REQUIRES URLs
    be entity-escaped inside ``<loc>``), ``&amp;`` last so double
    escapes survive one level. Feed the url column through
    :func:`canonical_url` / :func:`url_dedup` before crawling."""
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit("<loc>([^<]*)</loc>"), 1
    )
    is_index = F.col(xml_col).contains("<sitemapindex")
    # the explode lives alone in its select (a generator may not nest
    # inside other expressions); trim/unescape follow in a projection
    # the optimizer fuses into the same stage.
    exploded = df.select(
        F.col(id_col),
        F.explode(locs).alias("_loc"),
        is_index.alias("is_index"),
    )
    # btrim with an explicit set: plain trim strips only ' ', and
    # sitemap generators routinely pretty-print <loc> with newlines.
    url = F.btrim(F.col("_loc"), F.lit(" \t\r\n"))
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    return exploded.select(
        F.col(id_col),
        url.alias("url"),
        "is_index",
    )


def robots_rules(
    df: DataFrame,
    agent: str = "*",
    robots_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Parse robots.txt bodies into per-host prefix rules:
    (host, allow, path_prefix) — one row per Allow/Disallow line in a
    group whose ``User-agent`` set contains ``agent`` (exact,
    case-insensitive). The documented subset of RFC 9309: ``#``
    comments stripped, header names case-insensitive, a group is a run
    of consecutive ``User-agent`` lines followed by its rules,
    empty-path rules dropped (an empty Disallow allows everything),
    and no agent-specificity fallback — pass the agent whose group you
    want, ``*`` for the default group.

    Pure expressions + one per-host window (group numbering is a
    running sum of group starts) + one equi-join of rule lines to
    matching-agent groups. Scale: robots files are small and per-host;
    everything partitions by host.

    Paths may carry RFC 9309 ``*`` (any octet sequence) and a trailing
    ``$`` (end anchor) — the parser passes them through verbatim;
    :func:`robots_filter` interprets them."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("pos", "raw"),
    ).select(
        "host",
        "pos",
        F.trim(F.regexp_replace(F.col("raw"), "#.*$", "")).alias("line"),
    )
    kind = (
        F.when(F.lower(F.col("line")).rlike("^user-agent\\s*:"), F.lit("ua"))
        .when(F.lower(F.col("line")).rlike("^allow\\s*:"), F.lit("allow"))
        .when(F.lower(F.col("line")).rlike("^disallow\\s*:"), F.lit("disallow"))
    )
    value = F.trim(F.regexp_extract(F.col("line"), "^[^:]*:(.*)$", 1))
    typed = lines.select(
        "host", "pos", kind.alias("kind"), value.alias("value")
    ).where(F.col("kind").isNotNull())

    from pyspark.sql.window import Window

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("kind") == "ua"
    started = (
        is_ua & ~F.coalesce(F.lag("kind").over(w) == "ua", F.lit(False))
    ).cast("int")
    grouped = typed.withColumn("grp", F.sum(started).over(w))
    agents = (
        grouped.where(is_ua)
        .where(F.lower(F.col("value")) == agent.lower())
        .select("host", "grp")
        .distinct()
    )
    return (
        grouped.where(~is_ua)
        .where(F.col("value") != "")
        .join(agents, ["host", "grp"])
        .select(
            "host",
            (F.col("kind") == "allow").alias("allow"),
            F.col("value").alias("path_prefix"),
        )
        .distinct()
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply :func:`robots_rules` output to a URL frontier with RFC
    9309 longest-match-wins semantics (Allow wins length ties):
    returns (id_col, url, host, allowed). URLs with no matching rule —
    or whose host has no rules at all — are allowed. Patterns match
    against PATH + QUERY (only the ``#fragment`` is stripped —
    RFC 9309 / google/robotstxt's GetPathParamsQuery), so a
    query-targeting rule like ``Disallow: /*?sid=`` works and a
    ``$``-anchored rule must match through the query string. A URL
    with no path component matches as ``/`` (the root path, so
    ``Disallow: /`` blocks ``http://a.test``); a query with no path
    (``http://a.test?q``) matches as ``/?q``.

    Rule paths support the full RFC 9309 pattern syntax: ``*`` matches
    any octet sequence and a trailing ``$`` anchors the end; matching
    compiles each pattern to a SQL LIKE (escape ``!``, translate ``*``
    to ``%``, append ``%`` unless anchored) — prefix rules are just
    patterns without wildcards. Specificity is the octet length of
    the RAW rule path (RFC 9309 2.2.2: most octets wins; ``*``/``$``
    count as octets, matching the reference google/robotstxt matcher).

    Shape: an equi-join on host with a LIKE predicate, then a
    max-struct aggregate per URL (map-side combinable: (pattern_len,
    allow) ordering makes the longest match, allow-on-tie, the max) —
    never a window over the frontier. Rules per host are few; the join
    broadcasts when the rule table is small."""
    raw_path = F.regexp_replace(
        F.regexp_replace(F.col(url_col), _AUTHORITY_RE, ""),
        "#.*$",
        "",
    )
    u = urls.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        url_host(F.col(url_col)).alias("host"),
        F.when(raw_path == "", F.lit("/"))
        .when(
            raw_path.startswith("?"), F.concat(F.lit("/"), raw_path)
        )
        .otherwise(raw_path)
        .alias("_path"),
    )
    anchored = F.col("path_prefix").endswith("$")
    body = F.when(
        anchored,
        F.expr("substring(path_prefix, 1, length(path_prefix) - 1)"),
    ).otherwise(F.col("path_prefix"))
    like_body = F.translate(
        F.regexp_replace(body, "([!%_])", r"!$1"), "*", "%"
    )
    like_pat = F.when(anchored, like_body).otherwise(
        F.concat(like_body, F.lit("%"))
    )
    matched = (
        u.join(rules, "host")
        .withColumn("_pat", like_pat)
        .where(F.expr("_path LIKE _pat ESCAPE '!'"))
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.octet_length("path_prefix").alias("l"),
                    F.col("allow").alias("allow"),
                )
            ).alias("_best")
        )
        .select(F.col(id_col), F.col("_best.allow").alias("_allow"))
    )
    return u.join(matched, id_col, "left").select(
        id_col,
        "url",
        "host",
        F.coalesce(F.col("_allow"), F.lit(True)).alias("allowed"),
    )


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id_col, src_host, href, dst_host): one row per ``href="..."``
    in the HTML. Absolute http(s) hrefs resolve to their canonical
    host; anything else (relative, mailto, javascript) counts as a
    same-host link — the coarse resolution a host-level web graph
    needs, kept in codegen (regexp_extract_all + explode)."""
    hrefs = F.regexp_extract_all(
        F.col(html_col), F.lit('href="([^"]*)"'), 1
    )
    src = url_host(F.col(url_col))
    exploded = df.select(
        F.col(id_col),
        src.alias("src_host"),
        F.explode(hrefs).alias("href"),
    )
    dst = F.when(
        F.lower(F.col("href")).rlike("^https?://"),
        url_host(F.col("href")),
    ).otherwise(F.col("src_host"))
    return exploded.select(
        id_col, "src_host", "href", dst.alias("dst_host")
    )


def host_link_graph(
    links: DataFrame,
    keep_self_loops: bool = True,
) -> DataFrame:
    """Aggregate :func:`extract_links` rows into the host-level web
    graph: (src_host, dst_host, n_links). One hash aggregate; feed the
    edges into graph/analyze.py (PageRank, components) for host
    authority scoring."""
    e = links
    if not keep_self_loops:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def domain_filter(
    df: DataFrame,
    blocked_hosts: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose canonical host is in ``blocked_hosts`` (the
    crawl blocklist case). The list is a literal set in the plan —
    a blocklist of real size should be a broadcast anti-join instead;
    this covers the in-plan small-list case."""
    host = url_host(F.col(url_col))
    return df.where(~host.isin([h.lower() for h in blocked_hosts]))
