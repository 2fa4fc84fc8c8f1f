"""Oracle-checked web-crawl operators: HTML-to-text extraction, URL
canonicalization, per-domain crawl caps (operators/web.py).

Gate shapes:
  - q_web_html_text runs the SAME regex pipeline in both engines over
    an identically-constructed HTML string (the chain is the unit
    under test — Java regex vs RE2 agreement is exactly what the
    cross-engine hash proves);
  - q_web_url_canonical is stronger: Spark PARSES and canonicalizes
    messy fixture URLs, while DuckDB computes the expected canonical
    form closed-form from the generation rules — the oracle never
    touches a regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corrie_spark.operators import web as W
from corrie_spark.queries.registry import register
from corrie_spark.tables import load

# --- HTML -> text ------------------------------------------------------------

# identical string in both engines; {S} = STRING (Spark) / VARCHAR
# (DuckDB); python twin = operators/web.fixture_page (equality pinned
# by tests/test_web.py)
_HTML_TMPL = W.FIXTURE_PAGE_TMPL

_HTML_ORACLE = f"""
SELECT doc_id,
       {W.html_to_text_sql(_HTML_TMPL.format(S="VARCHAR"))} AS extracted,
       CAST(length({W.html_to_text_sql(_HTML_TMPL.format(S="VARCHAR"))}) AS BIGINT)
         AS n_chars
FROM documents
"""


@register("q_web_html_text", oracle=_HTML_ORACLE)
def q_web_html_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip over per-doc pages (title/script/style/
    lists/entities/comments, mixed-case tags, a '<' INSIDE script
    text): the tag/entity/whitespace pipeline runs JVM-side in one
    whole-stage-codegen projection; the oracle executes the identical
    chain in RE2, so the gate pins the two regex engines to the same
    semantics on crawl-shaped markup."""
    docs = load(spark, sf_dir, "documents")
    html = F.expr(_HTML_TMPL.format(S="STRING"))
    extracted = W.html_to_text(html)
    return docs.select(
        "doc_id",
        extracted.alias("extracted"),
        F.length(extracted).cast("long").alias("n_chars"),
    )


# --- URL canonicalization ----------------------------------------------------

# messy fixture URLs: mixed-case scheme/host, default and non-default
# ports, tracking params out of order, fragments
_URL_TMPL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTP' WHEN doc_id % 3 = 1 THEN 'https' "
    "ELSE 'HTTPS' END || '://WWW.Site' || CAST(doc_id % 40 AS {S}) || "
    "'.Example.' || CASE WHEN doc_id % 4 = 1 THEN 'org' "
    "WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END || "
    "CASE WHEN doc_id % 3 = 0 THEN ':80' WHEN doc_id % 3 = 1 THEN ':443' "
    "ELSE ':8443' END || '/Doc/' || CAST(doc_id AS {S}) || "
    "'?utm_source=feed&b=' || CAST(doc_id % 7 AS {S}) || '&a=1#sec'"
)

_URL_ORACLE = f"""
WITH rules AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'http' ELSE 'https' END AS scheme,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host,
    CASE WHEN doc_id % 3 = 2 THEN ':8443' ELSE '' END AS port,
    '/Doc/' || CAST(doc_id AS VARCHAR) AS path,
    'a=1&b=' || CAST(doc_id % 7 AS VARCHAR) AS query,
    'example.' || CASE WHEN doc_id % 4 = 1 THEN 'org'
                       WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS domain
  FROM documents
)
SELECT doc_id, scheme, host, domain,
       scheme || '://' || host || port || path || '?' || query AS canon
FROM rules
"""


@register("q_web_url_canonical", oracle=_URL_ORACLE)
def q_web_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization through the real parser: Spark parses the
    messy fixture URL (mixed-case scheme/host, default ports to
    strip, a non-default port to keep, tracking params to drop,
    unsorted params to sort, a fragment to cut) and the oracle states
    the expected canonical form CLOSED-FORM from the generation rules
    — the parse/canonicalize chain is verified against ground truth,
    not against another regex."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_TMPL.format(S="STRING"))
    host = W.url_host(url)
    return docs.select(
        "doc_id",
        W.url_scheme(url).alias("scheme"),
        host.alias("host"),
        W.registered_domain(host).alias("domain"),
        W.canonical_url(url).alias("canon"),
    )


_CAPS_ORACLE = f"""
WITH rules AS (
  SELECT doc_id,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host
  FROM documents
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(LEAST(COUNT(*), 5) AS BIGINT) AS n_kept
FROM rules GROUP BY host
"""


@register("q_web_domain_caps", oracle=_CAPS_ORACLE)
def q_web_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl caps (the anti-SEO-farm sampling stage every
    training pipeline runs): keep the first 5 docs per host in stable
    doc_id order. One window over the host partition + one rollup —
    the window's exchange IS the rollup's exchange, so the cap rides
    the shuffle the count needed anyway."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_TMPL.format(S="STRING"))
    hosts = docs.select("doc_id", W.url_host(url).alias("host"))
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        hosts.withColumn("_rn", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("_rn") <= 5).cast("long")).alias("n_kept"),
        )
    )


# --- robots.txt filtering ------------------------------------------------

_ROBOTS_ORACLE = """
SELECT doc_id,
  'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
    CASE WHEN doc_id % 4 = 1 THEN 'org'
         WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host,
  CASE WHEN (doc_id % 40) % 2 = 0
       THEN CASE WHEN ends_with(CAST(doc_id AS VARCHAR), '77') THEN TRUE
            WHEN ends_with(CAST(doc_id AS VARCHAR), '7') THEN FALSE
            WHEN starts_with(CAST(doc_id AS VARCHAR), '12') THEN TRUE
            WHEN starts_with(CAST(doc_id AS VARCHAR), '1') THEN FALSE
            ELSE TRUE END
       ELSE TRUE END AS allowed,
  CAST(CASE WHEN (doc_id % 40) % 2 = 0 THEN 4.0 ELSE 0.0 END AS DOUBLE)
    AS crawl_delay
FROM documents
"""

# even hosts: a megabot-specific group to skip, then the generic group
# with prefix rules + a Crawl-delay, plus a group-independent Sitemap
_ROBOTS_EVEN = (
    "User-agent: megabot\nDisallow: /\n\n"
    "User-agent: *\n# block list\nDisallow: /Doc/1\nAllow: /Doc/12\n"
    "Disallow: /Doc/*7$\nAllow: /Doc/*77$\n"
    "Crawl-delay: 4\nSitemap: https://example.com/sitemap.xml\n"
)
_ROBOTS_ODD = "User-agent: *\nDisallow:\n"  # empty Disallow = allow all


@register("q_web_robots_filter", oracle=_ROBOTS_ORACLE, python_stages="robots.txt rule parse (tiny mapInPandas, host-sized)")
def q_web_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots filtering through the real parser and matcher:
    per-host robots.txt (group selection past a megabot-specific
    group, comments, an empty Disallow meaning allow-all) -> rule
    table -> broadcast most-specific-rule match with allow-wins-ties
    ('/Doc/12' overrides 'Disallow: /Doc/1'), INCLUDING the §2.2.3
    wildcard forms: 'Disallow: /Doc/*7$' anchors ids ending in 7 and
    the longer 'Allow: /Doc/*77$' overrides it by octet length. The
    selected group's Crawl-delay is surfaced per host (the de-facto
    politeness extension). The oracle states the expected verdicts AND
    delays closed-form from the fixture rules — parser, group
    selection, wildcard matching and precedence are all checked
    against ground truth. Scale: the rule table is per-host metadata
    (broadcast); URLs never reshuffle."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_TMPL.format(S="STRING"))
    urls = docs.select("doc_id", url.alias("url"))
    hosts = urls.select(W.url_host("url").alias("host")).distinct()
    k = F.regexp_extract("host", r"site([0-9]+)\.", 1).cast("long")
    robots = hosts.withColumn(
        "robots_txt",
        F.when(k % 2 == 0, F.lit(_ROBOTS_EVEN)).otherwise(F.lit(_ROBOTS_ODD)),
    )
    rules = W.robots_rules(robots)
    delays = W.crawl_delays(rules)
    return (
        W.allowed_urls(urls, rules)
        .withColumn("host", W.url_host("url"))
        .join(F.broadcast(delays), "host", "left")
        .select(
            "doc_id",
            "host",
            "allowed",
            F.coalesce("crawl_delay", F.lit(0.0)).alias("crawl_delay"),
        )
    )


_POLITE_ORACLE = """
WITH rules AS (
  SELECT doc_id,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host,
    (doc_id % 40) % 2 = 0 AS slow
  FROM documents
)
SELECT host,
       CAST(CASE WHEN slow THEN 4.0 ELSE 0.0 END AS DOUBLE) AS crawl_delay,
       CAST(CASE WHEN slow THEN 2 ELSE 5 END AS BIGINT) AS cap,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(LEAST(COUNT(*), CASE WHEN slow THEN 2 ELSE 5 END) AS BIGINT)
         AS n_kept
FROM rules GROUP BY host, slow
"""


@register("q_web_polite_caps", oracle=_POLITE_ORACLE, python_stages="robots.txt rule parse (host-sized mapInPandas)")
def q_web_polite_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl caps weighted by the robots Crawl-delay: a host
    asking for d seconds between fetches yields at most budget/d pages
    per crawl window, so fixture hosts advertising Crawl-delay 4 under
    a 10-second budget cap at floor(10/4)=2 pages while unconstrained
    hosts keep the base cap of 5. Runs the REAL chain — robots parse
    -> group selection -> crawl_delays -> budget arithmetic -> window
    cap — against closed-form expected caps/keeps. The delay table is
    broadcast; the cap window rides the per-host rollup exchange."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_TMPL.format(S="STRING"))
    urls = docs.select("doc_id", url.alias("url"))
    hosts = urls.select(W.url_host("url").alias("host")).distinct()
    k = F.regexp_extract("host", r"site([0-9]+)\.", 1).cast("long")
    robots = hosts.withColumn(
        "robots_txt",
        F.when(k % 2 == 0, F.lit(_ROBOTS_EVEN)).otherwise(F.lit(_ROBOTS_ODD)),
    )
    rules = W.robots_rules(robots)
    return W.host_caps_weighted(
        urls, rules, base_cap=5, url_col="url", budget_s=10.0
    )


# --- sitemap XML (sitemaps.org) -------------------------------------------

_SITEMAP_ORACLE = """
WITH h AS (
  SELECT doc_id,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host
  FROM documents
),
g AS (SELECT host, list_sort(list(doc_id)) AS ids FROM h GROUP BY host)
SELECT host,
       'urlset' AS kind,
       CAST(len(ids) AS BIGINT) AS n_locs,
       md5(array_to_string(
         list_transform(ids, i -> 'https://' || host || '/doc/' || CAST(i AS VARCHAR)),
         '|')) AS locs_md5
FROM g
"""


@register("q_web_sitemap", oracle=_SITEMAP_ORACLE, python_stages="sitemap XML parse (host-sized mapInPandas)")
def q_web_sitemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML frontier expansion (sitemaps.org): per-host urlset
    documents are BUILT in-plan (sorted <url><loc> entries with
    whitespace padding and <lastmod> noise), then run through the real
    extraction chain — sitemap_kind routing + <loc> regex + trim +
    posexplode — and re-aggregated in document order. The oracle
    states the expected loc list closed-form from the generation
    rules, so kind detection, extraction, trimming AND ordering are
    all gated. Scale: XML build/extract are row-local; the only
    shuffles are the per-host groupBys the rollup needs anyway."""
    docs = load(spark, sf_dir, "documents")
    url = F.expr(_URL_TMPL.format(S="STRING"))
    hosts = docs.select("doc_id", W.url_host(url).alias("host"))
    xml = hosts.groupBy("host").agg(
        F.concat(
            F.lit('<?xml version="1.0" encoding="UTF-8"?>'
                  '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda i: F.concat(
                        F.lit("<url><loc>\n  https://"),
                        F.col("host"),
                        F.lit("/doc/"),
                        i.cast("string"),
                        F.lit(" </loc><lastmod>2026-01-01</lastmod></url>"),
                    ),
                ),
                "",
            ),
            F.lit("</urlset>"),
        ).alias("sitemap_xml")
    )
    frontier = W.sitemap_frontier(xml)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "loc"))),
        lambda s: s["loc"],
    )
    return frontier.groupBy("host").agg(
        F.first("kind").alias("kind"),
        F.count(F.lit(1)).alias("n_locs"),
        F.md5(F.array_join(ordered, "|")).alias("locs_md5"),
    )


# --- sitemap TREES: gzip payloads + nested sitemapindex ----------------------

# Per host k = doc_id % 40 (the q_web_sitemap host family):
#   root sitemap.xml  = sitemapindex listing c0.xml (plain urlset),
#                       c1.xml.gz (GZIPPED urlset), and — even k only —
#                       nested.xml.gz (a GZIPPED sitemapindex) that
#                       lists c2.xml.gz AND the root itself (a cycle).
#   page partition: even k by doc_id % 3 across c0/c1/c2 (c2 pages are
#   therefore depth 2); odd k by doc_id % 2 across c0/c1 (all depth 1).
_SITEMAP_TREE_ORACLE = """
WITH h AS (
  SELECT doc_id, doc_id % 40 AS k,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host
  FROM documents
),
g AS (
  SELECT host, k,
         CAST(COUNT(*) AS BIGINT) AS n_pages,
         CAST(SUM(CASE WHEN k % 2 = 0 AND doc_id % 3 = 2
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_depth2,
         md5(array_to_string(
           list_sort(list('https://' || host || '/doc/'
                          || CAST(doc_id AS VARCHAR))), '|')) AS pages_md5
  FROM h GROUP BY host, k
)
SELECT host, n_pages, n_depth2, pages_md5 FROM g ORDER BY host
"""


def _build_sitemap_tree(host: str, ids: list[int]) -> list[tuple[str, bytes]]:
    """One host's sitemap file set as (url, payload-bytes) rows; gz
    members via the plain gzip module (fixture side of the RFC 1952
    contract sitemap_decode consumes)."""
    import gzip

    base = f"https://{host}"
    k = int(host.split(".example.")[0].removeprefix("www.site"))

    def urlset(page_ids: list[int]) -> bytes:
        body = "".join(
            f"<url><loc>\n  {base}/doc/{i} </loc>"
            f"<lastmod>2026-01-01</lastmod></url>"
            for i in sorted(page_ids)
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{body}</urlset>"
        ).encode()

    def index(child_urls: list[str]) -> bytes:
        body = "".join(
            f"<sitemap><loc> {u}\n</loc></sitemap>" for u in child_urls
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            "<!-- mentions <sitemapindex> in a comment -->"
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{body}</sitemapindex>"
        ).encode()

    gz = lambda b: gzip.compress(b, compresslevel=1)  # noqa: E731
    rows: list[tuple[str, bytes]] = []
    if k % 2 == 0:
        rows.append(
            (
                f"{base}/sitemap.xml",
                index(
                    [f"{base}/c0.xml", f"{base}/c1.xml.gz", f"{base}/nested.xml.gz"]
                ),
            )
        )
        rows.append((f"{base}/c0.xml", urlset([i for i in ids if i % 3 == 0])))
        rows.append((f"{base}/c1.xml.gz", gz(urlset([i for i in ids if i % 3 == 1]))))
        # gzipped NESTED index; lists the root again (cycle) — the
        # visited anti-join must make it contribute nothing
        rows.append(
            (
                f"{base}/nested.xml.gz",
                gz(index([f"{base}/c2.xml.gz", f"{base}/sitemap.xml"])),
            )
        )
        rows.append((f"{base}/c2.xml.gz", gz(urlset([i for i in ids if i % 3 == 2]))))
    else:
        rows.append(
            (f"{base}/sitemap.xml", index([f"{base}/c0.xml", f"{base}/c1.xml.gz"]))
        )
        rows.append((f"{base}/c0.xml", urlset([i for i in ids if i % 2 == 0])))
        rows.append((f"{base}/c1.xml.gz", gz(urlset([i for i in ids if i % 2 == 1]))))
    return rows


def _shared_sitemap_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session memo of the decoded per-host sitemap-tree table
    (host, url, sitemap_xml) — the fixture build (applyInPandas tree
    writer + gz decode) feeds BOTH q_web_sitemap_index and
    q_web_sitemap_discovery, so it runs once per session and both
    resolvers probe the checkpointed frame (the _shared_records
    fixture discipline; per-host metadata, <=5 small rows a host).
    Deterministic fixture, memoized == inline bit-identically."""
    import pandas as pd

    from corrie_spark.queries.dedup_queries import _memo

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        url = F.expr(_URL_TMPL.format(S="STRING"))
        # single-file scan = one partition; spread it before the regex
        # projection + fixture build (the verify-skill repartition lesson)
        hosts = (
            docs.select("doc_id")
            .repartition(spark.sparkContext.defaultParallelism)
            .select("doc_id", W.url_host(url).alias("host"))
        )

        def mk(key, pdf):
            host = str(key[0])
            rows = _build_sitemap_tree(host, [int(i) for i in pdf["doc_id"]])
            return pd.DataFrame(
                [{"host": host, "url": u, "content": b} for u, b in rows]
            )

        files = (
            # keep the tiny per-host fixture shuffle parallel under AQE
            hosts.repartition(
                spark.sparkContext.defaultParallelism, "host"
            )
            .groupBy("host")
            .applyInPandas(mk, "host string, url string, content binary")
        )
        # the decoded sitemap table is consumed by every unrolled
        # resolver level — checkpoint it so the fixture-build lineage
        # runs once, not once per level (the AQE-reuse-doesn't-fire-
        # across-pruned-consumers lesson)
        return W.sitemap_decode(files).localCheckpoint(eager=True)

    return _memo(spark, sf_dir, "sitemap_tree", build)


@register("q_web_sitemap_index", oracle=_SITEMAP_TREE_ORACLE, python_stages="host-sized tree fixture build + gz decode Arrow stages")
def q_web_sitemap_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap TREE resolution — the wild-form sitemap stack the flat
    q_web_sitemap doesn't cover: per-host fixture trees whose root is
    a sitemapindex, children alternate plain / GZIPPED (.xml.gz, the
    dominant deployed form), even-k hosts add a gzipped NESTED index
    (depth-2 pages) that also lists the root back (a cycle the
    visited anti-join must neutralize). The resolver is depth-bounded
    and declarative (resolve_sitemap_tree); the oracle states every
    host's full page set, the depth-2 population, and the cycle's
    no-double-count closed-form. Scale: sitemap tables are per-host
    metadata — each level is a broadcast-able (host,url) join + a
    row-local explode; page bytes never appear."""
    sitemaps = _shared_sitemap_tree(spark, sf_dir)
    roots = (
        sitemaps.select("host").distinct().withColumn(
            "url", F.concat(F.lit("https://"), F.col("host"), F.lit("/sitemap.xml"))
        )
    )
    # 3 levels resolve the fixture (root -> children -> nested child);
    # the bound's robustness at depth>needed is pinned by the unit
    # test, so the query doesn't pay a 4th all-empty join level
    pages = W.resolve_sitemap_tree(sitemaps, roots, max_depth=3)
    return (
        pages.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum((F.col("depth") == 2).cast("long")).alias("n_depth2"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("loc")), "|")
            ).alias("pages_md5"),
        )
        .orderBy("host")
    )


# --- the full crawl -> robots composition -----------------------------------

_HOST_SQL = (
    "'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' || "
    "CASE WHEN doc_id % 4 = 1 THEN 'org' "
    "WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END"
)

_CRAWL_ROBOTS_ORACLE = f"""
SELECT doc_id,
  {_HOST_SQL} AS host,
  CASE WHEN (doc_id % 40) % 2 = 0
       THEN CASE WHEN ends_with(CAST(doc_id AS VARCHAR), '77') THEN TRUE
            WHEN ends_with(CAST(doc_id AS VARCHAR), '7') THEN FALSE
            WHEN starts_with(CAST(doc_id AS VARCHAR), '12') THEN TRUE
            WHEN starts_with(CAST(doc_id AS VARCHAR), '1') THEN FALSE
            ELSE TRUE END
       ELSE TRUE END AS allowed
FROM documents
"""


def _host_expr():
    k = F.col("doc_id") % 40
    tld = (
        F.when(F.col("doc_id") % 4 == 1, F.lit("org"))
        .when(F.col("doc_id") % 4 == 2, F.lit("co.uk"))
        .otherwise(F.lit("com"))
    )
    return F.concat(
        F.lit("www.site"), k.cast("string"), F.lit(".example."), tld
    )


def _shared_robots_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-host crawl fixture WITH per-host robots.txt responses —
    built from warc.py record primitives inside one applyInPandas
    group per file, exactly the fixture_files shape — memoized."""
    import gzip

    import pandas as pd

    from corrie_spark.queries.dedup_queries import _memo
    from corrie_spark.sources import warc as Wc
    from corrie_spark.tables import load

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")

        def mk(key, pdf):
            grp = int(key[0])
            members = [Wc.warcinfo_record(f"rb-{grp:05d}.warc.gz")]
            hosts_done = set()
            for did, text in sorted(zip(pdf["doc_id"], pdf["text"])):
                did = int(did)
                k = did % 40
                tld = "org" if did % 4 == 1 else ("co.uk" if did % 4 == 2 else "com")
                host = f"www.site{k}.example.{tld}"
                if host not in hosts_done:
                    hosts_done.add(host)
                    robots = _ROBOTS_EVEN if k % 2 == 0 else _ROBOTS_ODD
                    members.append(
                        Wc.plain_response_record(
                            f"robots:{host}", f"https://{host}/robots.txt", robots
                        )
                    )
                members.append(
                    Wc.plain_response_record(
                        f"page:{did}", f"https://{host}/Doc/{did}", str(text)
                    )
                )
            blob = b"".join(gzip.compress(m, compresslevel=1) for m in members)
            return pd.DataFrame(
                [{"path": f"rb-{grp:05d}.warc.gz", "content": blob}]
            )

        files = (
            docs.withColumn("_grp", F.col("doc_id") % 8)
            # keep the tiny fixture shuffle parallel under AQE
            .repartition(docs.sparkSession.sparkContext.defaultParallelism, "_grp")
            .groupBy("_grp")
            .applyInPandas(mk, "path string, content binary")
        )
        recs = Wc.warc_records(files).drop("payload").persist()
        recs.count()
        return recs

    return _memo(spark, sf_dir, "robots_crawl_records", build)


@register("q_warc_robots_pipeline", oracle=_CRAWL_ROBOTS_ORACLE, python_stages="applyInPandas fixture + mapInPandas ingest + robots parse")
def q_warc_robots_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The politeness loop closed END-TO-END from crawl bytes: a
    multi-host fixture crawl carries each host's /robots.txt as an
    ORDINARY response record; the pipeline extracts robots bodies from
    the ingested frame (no side channel), parses them through the RFC
    9309 machinery, and filters the same crawl's page records. Three
    oracle-checked subsystems composed in one statement — WARC
    framing, robots parsing/precedence, URL matching — with verdicts
    stated closed-form from the fixture rules. Scale: robots rows are
    per-host metadata extracted by a host-keyed distinct; page URLs
    never reshuffle (broadcast rule join)."""
    recs = _shared_robots_crawl(spark, sf_dir)
    pages = recs.where(
        (F.col("warc_type") == "response")
        & ~F.col("target_uri").endswith("/robots.txt")
    ).select(
        F.regexp_extract("target_uri", r"/Doc/([0-9]+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
    )
    robots = (
        recs.where(F.col("target_uri").endswith("/robots.txt"))
        .select(
            W.url_host("target_uri").alias("host"),
            F.col("text").alias("robots_txt"),
        )
        .dropDuplicates(["host"])
    )
    rules = W.robots_rules(robots)
    return W.allowed_urls(pages, rules).select(
        "doc_id", W.url_host("url").alias("host"), "allowed"
    )


# --- Markdown -> text --------------------------------------------------------

_MD_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS t
  FROM documents
)
SELECT doc_id,
       md5(array_to_string(t, ' ')) AS text_md5,
       CAST(strlen(array_to_string(t, ' '))
            - strlen(replace(array_to_string(t, ' '), ' ', ''))
            + CASE WHEN len(t) = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_words
FROM toks WHERE len(t) > 0
"""


@register("q_text_markdown", oracle=_MD_ORACLE, python_stages="Arrow fixture build; strip is the JVM chain")
def q_text_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown structure strip through the real chain: each document
    becomes a fixture .md (headers, bold, links, inline code, bullets,
    blockquotes rotating per line — every decoration the exact inverse
    of one MD_STEPS rule), built in an Arrow stage, stripped by the
    JVM regex chain. The oracle states the expected text closed-form:
    the token stream re-joined with single spaces — so marker
    stripping, link-text retention and whitespace collapse are all
    value-gated against ground truth. Scale: row-local projection,
    free rider on the scan."""
    import pandas as pd

    from corrie_spark.tables import load as _load

    docs = _load(spark, sf_dir, "documents")

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(
                        [int(i) for i in pdf["doc_id"]], dtype="Int64"
                    ),
                    "md": [
                        W.fixture_markdown(int(i), str(t))
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    md = (
        docs.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(build, "doc_id long, md string")
    )
    extracted = W.markdown_to_text(F.col("md"))
    words = F.size(F.split(F.trim(extracted), r" +"))
    return md.where(F.length("md") > 0).select(
        "doc_id",
        F.md5(extracted).alias("text_md5"),
        words.cast("long").alias("n_words"),
    )


# --- LaTeX -> text -----------------------------------------------------------


@register(
    "q_text_latex",
    oracle=_MD_ORACLE,
    python_stages="Arrow fixture build; strip is the JVM chain",
)
def q_text_latex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LaTeX structure strip (the arXiv-source stance): each document
    becomes a fixture .tex (preamble + per-line decorations rotating
    through sectioning, bold, citations, comments, itemize, inline
    math, href and grouping braces — every one the exact inverse of
    one LATEX_STEPS rule), built in an Arrow stage, stripped by the
    JVM regex chain (latex_to_text). The oracle states the expected
    text closed-form — the token stream re-joined with single spaces,
    identical ground truth to the Markdown family — so comment/math
    dropping, argument-text retention and whitespace collapse are all
    value-gated. Scale: row-local projection, free rider on the
    scan."""
    import pandas as pd

    from corrie_spark.tables import load as _load

    docs = _load(spark, sf_dir, "documents")

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(
                        [int(i) for i in pdf["doc_id"]], dtype="Int64"
                    ),
                    "tex": [
                        W.fixture_latex(int(i), str(t))
                        for i, t in zip(pdf["doc_id"], pdf["text"])
                    ],
                }
            )

    tex = (
        docs.select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
        .mapInPandas(build, "doc_id long, tex string")
    )
    extracted = W.latex_to_text(F.col("tex"))
    words = F.size(F.split(F.trim(extracted), r" +"))
    return tex.where(F.length("tex") > 0).select(
        "doc_id",
        F.md5(extracted).alias("text_md5"),
        words.cast("long").alias("n_words"),
    )


# --- outlink extraction + resolution ------------------------------------------

# per doc: four links, one per reference shape, params closed-form
_OUTLINKS_ORACLE = """
WITH b AS (
  SELECT doc_id,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host,
    doc_id % 7 AS k
  FROM documents
),
l AS (
  SELECT doc_id,
    ['https://ext.example.com/abs/' || CAST(k AS VARCHAR),
     'https://' || host || '/deep/' || CAST(k AS VARCHAR),
     'https://' || host || '/Doc/rel-' || CAST(k AS VARCHAR),
     'https://cdn.example.net/c/' || CAST(k AS VARCHAR)] AS dsts
  FROM b
)
SELECT doc_id,
       CAST(4 AS BIGINT) AS n_links,
       md5(array_to_string(dsts, '|')) AS dsts_md5
FROM l
"""


@register("q_web_outlinks", oracle=_OUTLINKS_ORACLE)
def q_web_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlink extraction + RFC 3986 reference resolution — the crawl
    frontier-expansion stage: each fixture page carries one link per
    reference shape (absolute, path-absolute '/deep/k', relative
    'rel-k' against the /Doc/ directory, protocol-relative
    '//cdn...'), extracted by the real href chain and resolved against
    the page's own URL. The oracle states every resolved URL
    closed-form from the generation rules — extraction order,
    origin/directory arithmetic and scheme adoption are all gated.
    Row-local explode; no shuffle beyond the rollup."""
    docs = load(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("www.site"), (F.col("doc_id") % 40).cast("string"),
        F.lit(".example."),
        F.when(F.col("doc_id") % 4 == 1, F.lit("org"))
        .when(F.col("doc_id") % 4 == 2, F.lit("co.uk"))
        .otherwise(F.lit("com")),
    )
    k = (F.col("doc_id") % 7).cast("string")
    page_url = F.concat(
        F.lit("https://"), host, F.lit("/Doc/"),
        F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit('<html><body><p>text</p><a class="x" href="https://ext.example.com/abs/'),
        k, F.lit('">a</a><a href="/deep/'), k,
        F.lit("'>b</a><a href='rel-").cast("string"), k,
        F.lit('\'>c</a><a href="//cdn.example.net/c/'), k,
        F.lit('">d</a><a href="#frag">skip</a></body></html>'),
    )
    pages = docs.select(
        "doc_id", page_url.alias("url"), html.alias("html")
    )
    links = W.outlinks(pages, "url", "html")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "dst"))),
        lambda s: s["dst"],
    )
    return (
        links.withColumn(
            "doc_id",
            F.regexp_extract("src", r"/Doc/([0-9]+)$", 1).cast("long"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.md5(F.array_join(ordered, "|")).alias("dsts_md5"),
        )
    )


# --- the frontier composition: outlinks filtered by robots -------------------

_FRONTIER_ORACLE = """
SELECT doc_id,
       CAST(4 AS BIGINT) AS n_links,
       CAST(CASE WHEN (doc_id % 40) % 2 = 0 AND (doc_id % 20) % 10 = 7
                 THEN 3 ELSE 4 END AS BIGINT) AS n_allowed
FROM documents
"""


@register("q_web_frontier", oracle=_FRONTIER_ORACLE, python_stages="robots.txt parse stage (host-sized mapInPandas)")
def q_web_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frontier loop COMPOSED: page -> outlink extraction ->
    RFC 3986 resolution -> per-link robots verdict (the wildcard rule
    'Disallow: /Doc/*7$' fires on relative links 'rel-7'/'rel-17' of
    even hosts; external cdn/abs hosts have no rules and default to
    allowed) -> per-page allowed counts. Three gated subsystems in one
    statement, every verdict stated closed-form. Scale: extraction and
    resolution are row-local; the robots join is the broadcast
    distinct-(host,path) shape of allowed_urls."""
    docs = load(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("www.site"), (F.col("doc_id") % 40).cast("string"),
        F.lit(".example."),
        F.when(F.col("doc_id") % 4 == 1, F.lit("org"))
        .when(F.col("doc_id") % 4 == 2, F.lit("co.uk"))
        .otherwise(F.lit("com")),
    )
    k = (F.col("doc_id") % 20).cast("string")
    page_url = F.concat(
        F.lit("https://"), host, F.lit("/Doc/"),
        F.col("doc_id").cast("string"),
    )
    html = F.concat(
        F.lit('<a href="https://ext.example.com/abs/'), k,
        F.lit('">a</a><a href="/deep/'), k,
        F.lit('">b</a><a href="rel-'), k,
        F.lit('">c</a><a href="//cdn.example.net/c/'), k,
        F.lit('">d</a>'),
    )
    pages = docs.select(
        "doc_id", page_url.alias("url"), html.alias("html")
    )
    links = W.outlinks(pages, "url", "html")
    hosts = pages.select(W.url_host("url").alias("host")).distinct()
    kk = F.regexp_extract("host", r"site([0-9]+)\.", 1).cast("long")
    robots = hosts.withColumn(
        "robots_txt",
        F.when(kk % 2 == 0, F.lit(_ROBOTS_EVEN)).otherwise(F.lit(_ROBOTS_ODD)),
    )
    rules = W.robots_rules(robots)
    verdicts = W.allowed_urls(links, rules, url_col="dst")
    return (
        verdicts.withColumn(
            "doc_id",
            F.regexp_extract("src", r"/Doc/([0-9]+)$", 1).cast("long"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(F.col("allowed").cast("long")).alias("n_allowed"),
        )
    )


# --- sitemap DISCOVERY: robots Sitemap directive -> tree resolution ----------

# even-k hosts advertise their sitemap in robots.txt; odd-k hosts do
# not, so only even hosts contribute pages — the discovery loop
# (robots parse -> Sitemap directive -> tree resolve) is gated end to
# end, with the even-host tree shape from _build_sitemap_tree
# (c0/c1/c2 by id%3, nested gz index, root cycle).
_SITEMAP_DISCOVERY_ORACLE = """
WITH h AS (
  SELECT doc_id, doc_id % 40 AS k,
    'www.site' || CAST(doc_id % 40 AS VARCHAR) || '.example.' ||
      CASE WHEN doc_id % 4 = 1 THEN 'org'
           WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'com' END AS host
  FROM documents
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       md5(array_to_string(
         list_sort(list('https://' || host || '/doc/'
                        || CAST(doc_id AS VARCHAR))), '|')) AS pages_md5
FROM h WHERE k % 2 = 0
GROUP BY host ORDER BY host
"""


@register("q_web_sitemap_discovery", oracle=_SITEMAP_DISCOVERY_ORACLE,
          python_stages="robots parse + host-sized tree fixture build + gz decode Arrow stages")
def q_web_sitemap_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-seed DISCOVERY loop composed end to end: per-host
    robots.txt (only even-k hosts carry a `Sitemap:` directive) ->
    RFC 9309 rule parse -> sitemap_urls seeds -> depth-bounded tree
    resolution over the same gz/nested/cyclic fixture trees
    q_web_sitemap_index gates. Hosts that don't advertise a sitemap
    contribute NOTHING (the discovery filter is the directive, not
    the fixture) — the oracle states exactly the even-host page
    sets. Scale: robots and sitemap tables are per-host metadata;
    every stage is broadcast-join + row-local parse."""
    sitemaps = _shared_sitemap_tree(spark, sf_dir)

    k = F.regexp_extract("host", r"site([0-9]+)\.", 1).cast("long")
    robots = sitemaps.select("host").distinct().withColumn(
        "robots_txt",
        F.when(
            k % 2 == 0,
            F.concat(
                F.lit("User-agent: *\nDisallow:\nSitemap: https://"),
                F.col("host"),
                F.lit("/sitemap.xml\n"),
            ),
        ).otherwise(F.lit("User-agent: *\nDisallow:\n")),
    )
    # the discovered seed list is per-host metadata consumed by every
    # resolver level (joins AND the growing visited anti-join side) —
    # checkpoint it so the robots Arrow parse runs once, not per level
    roots = (
        W.sitemap_urls(W.robots_rules(robots))
        .select("host", F.col("sitemap").alias("url"))
        .localCheckpoint(eager=True)
    )
    pages = W.resolve_sitemap_tree(sitemaps, roots, max_depth=3)
    return (
        pages.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list("loc")), "|")
            ).alias("pages_md5"),
        )
        .orderBy("host")
    )
