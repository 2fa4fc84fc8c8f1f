"""Web-crawl text/URL operators: HTML-to-text extraction, URL parsing
and canonicalization, registered-domain extraction.

Everything here is a pure Column expression chain (JVM-side regex,
whole-stage codegen, zero Python) mirrored step-for-step in DuckDB
SQL by the q_web_* oracles — the crawl-pipeline stages that sit
between WARC ingestion (sources/warc.py) and the documents table.
Patterns stay inside the regex subset Java's engine and DuckDB's RE2
evaluate identically (no backreferences, no lookaround), which is
what makes the cross-engine gate possible.

Scale: these are row-local projections — at 100 TB they are free
riders on the ingest scan, no shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# HTML -> text
# ---------------------------------------------------------------------------

# (pattern, replacement) pipeline; inline (?is) flags work in both
# Java regex and RE2. Order matters: script/style bodies can contain
# '<' that must die BEFORE the generic tag strip.
HTML_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/title)\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
]

# fixed entity set (the ones crawl text actually carries in volume);
# '&amp;' LAST so '&amp;lt;' decodes to the literal '&lt;' and not '<'
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(c: Column | str) -> Column:
    """Strip tags/script/style/comments, decode the common entities,
    collapse whitespace. Deterministic and oracle-mirrored — NOT a
    DOM parser: malformed-tag soup degrades to extra whitespace, never
    to an exception (total function, crawl-safe)."""
    out = F.col(c) if isinstance(c, str) else c
    for pat, rep in HTML_STEPS:
        out = F.regexp_replace(out, pat, rep)
    for ent, rep in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_to_text_sql(expr: str) -> str:
    """The IDENTICAL chain as DuckDB SQL over `expr` — the oracle
    mirror (RE2 'g' flag replaces all occurrences, matching Spark's
    regexp_replace semantics)."""
    out = expr
    for pat, rep in HTML_STEPS:
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{rep}', 'g')"
    for ent, rep in HTML_ENTITIES:
        r = rep.replace("'", "''")
        out = f"replace({out}, '{ent}', '{r}')"
    return f"trim(regexp_replace({out}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

# RFC 3986-shaped split (no lookaround so RE2 evaluates it too):
# scheme :// host [:port] [path] [?query] [#fragment]
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#:]+)(?::([0-9]+))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# tracking parameters a canonical crawl URL drops
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid", "mc_eid")

# tiny public-suffix subset: enough for the fixture TLDs and the
# common two-label suffixes; a production deployment swaps in the
# full Mozilla public-suffix list (same shape, longer array)
TWO_LABEL_SUFFIXES = ("co.uk", "org.uk", "gov.uk", "com.au", "co.jp", "com.br")


def url_scheme(c: Column | str) -> Column:
    return F.lower(F.regexp_extract(c, URL_RE, 1))


def url_host(c: Column | str) -> Column:
    return F.lower(F.regexp_extract(c, URL_RE, 2))


def url_port(c: Column | str) -> Column:
    return F.regexp_extract(c, URL_RE, 3)


def url_path(c: Column | str) -> Column:
    return F.regexp_extract(c, URL_RE, 4)


def url_query(c: Column | str) -> Column:
    return F.regexp_extract(c, URL_RE, 5)


def registered_domain(host: Column | str) -> Column:
    """eTLD+1 under the TWO_LABEL_SUFFIXES subset: 'a.b.site.co.uk'
    -> 'site.co.uk', 'a.site.com' -> 'site.com'."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    is_two = last2.isin(*TWO_LABEL_SUFFIXES)
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 2, h)
        .when(is_two & (n >= 3), last3)
        .otherwise(last2)
    )


def canonical_query(c: Column | str) -> Column:
    """Drop tracking params, sort the rest (crawl identity must not
    depend on producer param order)."""
    q = F.col(c) if isinstance(c, str) else c

    def keep(p: Column) -> Column:
        cond = p != ""
        for pref in TRACKING_PREFIXES:
            cond = cond & ~p.startswith(pref)
        return cond

    return F.array_join(F.array_sort(F.filter(F.split(q, "&"), keep)), "&")


def canonical_url(c: Column | str) -> Column:
    """Canonical crawl identity: lowercase scheme+host, strip default
    ports (http:80 / https:443), drop the fragment, drop tracking
    params, sort surviving query params, '/' for an empty path."""
    scheme = url_scheme(c)
    host = url_host(c)
    port = url_port(c)
    path = url_path(c)
    q = canonical_query(url_query(c))
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == "80"))
        & ~((scheme == F.lit("https")) & (port == "443"))
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


# ---------------------------------------------------------------------------
# fixture HTML page (python + SQL twins for the WARC->HTML composition)
# ---------------------------------------------------------------------------

# one page shape, stated twice — the python builder feeds the WARC
# fixture encoder, the SQL template feeds the oracle; equality of the
# two constructions is pinned by tests/test_web.py.
FIXTURE_PAGE_TMPL = (
    "'<html><head><title>Doc ' || CAST(doc_id AS {S}) || '</title>"
    "<SCRIPT type=\"text/javascript\">var x = 1 < 2 && \"a&b\";</SCRIPT>"
    "<style>.c {{ color: red; }}</style></head>"
    "<body><h1>Doc ' || CAST(doc_id AS {S}) || '</h1>"
    "<p>' || text || '</p>"
    "<ul><li>alpha</li><li>beta</li></ul>"
    "<p>&amp; &lt;tag&gt; &#39;q&#39;&nbsp;end</p>"
    "<!-- comment <p>hidden</p> --></body></html>'"
)


def fixture_page(doc_id: int, text: str) -> str:
    """Python twin of FIXTURE_PAGE_TMPL (same bytes, pinned by test)."""
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        '<SCRIPT type="text/javascript">var x = 1 < 2 && "a&b";</SCRIPT>'
        "<style>.c { color: red; }</style></head>"
        f"<body><h1>Doc {doc_id}</h1>"
        f"<p>{text}</p>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<p>&amp; &lt;tag&gt; &#39;q&#39;&nbsp;end</p>"
        "<!-- comment <p>hidden</p> --></body></html>"
    )
