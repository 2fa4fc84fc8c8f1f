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
# Markdown -> text (READMEs / docs — the third markup family after
# HTML and the office formats)
# ---------------------------------------------------------------------------

# ordered (pattern, replacement) chain; $1 backreferences are Spark
# regexp_replace syntax (JVM-side only — the gated fixture is built in
# python and the oracle states expected text closed-form, so no RE2
# twin is needed). Fences/emphasis strip their MARKERS and keep the
# text (a training corpus wants the characters); order matters: bold
# markers die before bullet markers so '**a' can't be read as a list.
MD_STEPS: list[tuple[str, str]] = [
    (r"(?m)^```[^\n]*$", " "),          # fence lines (keep code text)
    (r"(?m)^#{1,6}\s+", ""),            # ATX headers
    (r"(?m)^>\s?", ""),                 # blockquote markers
    (r"(?m)^[-*_]{3,}\s*$", " "),       # horizontal rules
    (r"!\[([^\]]*)\]\([^)]*\)", "$1"),  # images -> alt text
    (r"\[([^\]]*)\]\([^)]*\)", "$1"),   # links -> link text
    (r"`([^`]*)`", "$1"),               # inline code spans
    (r"\*\*([^*]*)\*\*", "$1"),         # bold
    (r"__([^_]*)__", "$1"),
    (r"(?m)^[*+-]\s+", ""),             # list bullets
]


def markdown_to_text(c: Column | str) -> Column:
    """Strip Markdown structure, keep the characters: fence/emphasis
    markers, ATX headers, blockquotes, bullets, link/image syntax
    (keeping text/alt), inline-code backticks; whitespace collapses to
    single spaces. Deterministic and total — malformed markdown
    degrades to extra whitespace, never an exception (the crawl-safe
    stance html_to_text states)."""
    out = F.col(c) if isinstance(c, str) else c
    for pat, rep in MD_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def fixture_markdown(doc_id: int, text: str) -> str:
    """Deterministic markdown doc whose EXTRACTED text equals the
    token stream re-joined with single spaces: each fixture line gets
    one decoration rotating by (doc_id + index) — header, bold first
    word, link-wrapped first word, inline-code first word, bullet,
    blockquote — every one an exact inverse of one MD_STEPS rule."""
    from corrie_spark.sources.pdf import fixture_lines

    out = []
    for i, line in enumerate(fixture_lines(text)):
        mode = (doc_id + i) % 6
        w = line.split(" ", 1)
        rest = " " + w[1] if len(w) == 2 else ""
        if mode == 0:
            out.append("## " + line)
        elif mode == 1:
            out.append(f"**{w[0]}**{rest}")
        elif mode == 2:
            out.append(f"[{w[0]}](https://example.org/doc/{doc_id}){rest}")
        elif mode == 3:
            out.append(f"`{w[0]}`{rest}")
        elif mode == 4:
            out.append("- " + line)
        else:
            out.append("> " + line)
    return "\n\n".join(out)


# ---------------------------------------------------------------------------
# LaTeX -> text (arXiv-style sources — the fourth markup family)
# ---------------------------------------------------------------------------

# ordered (pattern, replacement) chain, Spark regexp_replace syntax.
# The detex convention a training corpus wants: keep prose, keep the
# argument text of sectioning/emphasis macros, DROP math bodies,
# references, comments and preamble machinery. Order is load-bearing:
# escaped \% hides behind a sentinel before comment stripping;
# drop-content macros (cite/ref/url/usepackage...) die before the
# generic keep-argument rule; bare commands (\item, \LaTeX) die after
# both so their braces-bearing forms are already resolved.
LATEX_STEPS: list[tuple[str, str]] = [
    (r"\\%", "\x01"),                        # escaped percent -> sentinel
    (r"(?m)%[^\n]*", " "),                   # comments
    ("\x01", "%"),
    (r"\$\$[^$]*\$\$", " "),                 # display math
    (r"\$[^$\n]*\$", " "),                   # inline math
    (r"\\\[[\s\S]*?\\\]", " "),              # \[ ... \] display math
    (r"\\\(([\s\S]*?)\\\)", " "),            # \( ... \) inline math
    (r"\\(?:begin|end)\{[^{}]*\}(?:\[[^\]]*\])?", " "),
    (r"\\href\{[^{}]*\}\{([^{}]*)\}", "$1"),  # keep link text
    (
        r"\\(?:cite[pt]?|ref|eqref|pageref|label|autoref|cref|url|"
        r"footnote|usepackage|documentclass|input|include|"
        r"includegraphics|bibliography|bibliographystyle|vspace|hspace)"
        r"\*?(?:\[[^\]]*\])?\{[^{}]*\}",
        " ",
    ),
    (r"\\[a-zA-Z]+\*?(?:\[[^\]]*\])?\{([^{}]*)\}", "$1"),  # keep argument
    (r"\\([&#_{}$])", "$1"),                 # escaped specials
    (r"\\\\\*?(?:\[[^\]]*\])?", " "),        # line breaks
    (r"\\[a-zA-Z]+\*?", " "),                # bare commands (\item, \LaTeX)
    (r"~", " "),                             # non-breaking space
    (r"[{}]", ""),                           # leftover grouping braces
]


def latex_to_text(c: Column | str) -> Column:
    """Strip LaTeX structure, keep the prose (the detex stance):
    comments, math bodies, reference/preamble macros and grouping
    vanish; sectioning/emphasis arguments and escaped specials keep
    their text; whitespace collapses. Deterministic and total —
    malformed/nested input degrades to extra whitespace or leftover
    literal text, never an exception (the crawl-safe stance the
    HTML/Markdown chains state)."""
    out = F.col(c) if isinstance(c, str) else c
    for pat, rep in LATEX_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def fixture_latex(doc_id: int, text: str) -> str:
    """Deterministic .tex source whose EXTRACTED text equals the token
    stream re-joined with single spaces: a standard preamble (strips
    to nothing), then one decoration per fixture line rotating by
    (doc_id + index) — sectioning, bold, citation tail, trailing
    comment, itemize wrapping, inline math insertion, href, grouping
    braces — every one the exact inverse of one LATEX_STEPS rule."""
    from corrie_spark.sources.pdf import fixture_lines

    out = [
        "\\documentclass[11pt]{article}",
        "\\usepackage{amsmath}",
        "%% fixture doc %d" % doc_id,
        "\\begin{document}",
    ]
    for i, line in enumerate(fixture_lines(text)):
        mode = (doc_id + i) % 8
        w = line.split(" ", 1)
        rest = " " + w[1] if len(w) == 2 else ""
        if mode == 0:
            out.append("\\section{%s}" % line)
        elif mode == 1:
            out.append("\\textbf{%s}%s" % (w[0], rest))
        elif mode == 2:
            out.append("%s \\cite{ref%d}" % (line, doc_id))
        elif mode == 3:
            out.append("%s %% trailing comment %d" % (line, i))
        elif mode == 4:
            out.append("\\begin{itemize}\n\\item %s\n\\end{itemize}" % line)
        elif mode == 5:
            out.append("%s $e_{%d}^2 = \\alpha$%s" % (w[0], i, rest))
        elif mode == 6:
            out.append(
                "\\href{https://example.org/doc/%d}{%s}%s" % (doc_id, w[0], rest)
            )
        else:
            out.append("{%s}%s" % (w[0], rest))
    out.append("\\end{document}")
    return "\n\n".join(out)


# ---------------------------------------------------------------------------
# outlink extraction + reference resolution (crawl frontier discovery)
# ---------------------------------------------------------------------------

# href attribute of anchor tags; fragment-only refs excluded at the
# class level. Java/RE2 common subset (no lookaround).
HREF_RE = r"""(?i)<a[^>]*\shref\s*=\s*["']([^"'#>][^"'>]*)["']"""


def html_links(c: Column | str) -> Column:
    """HTML -> array of raw href values, document order (anchor tags
    with quoted hrefs — the crawl-frontier shape; unquoted/javascript
    hrefs are noise a frontier drops anyway)."""
    x = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(x, F.lit(HREF_RE), F.lit(1))


def resolve_url(base: Column, ref: Column) -> Column:
    """RFC 3986 reference resolution, the subset crawl frontiers need:
    absolute refs pass through; '//host/p' takes the base scheme;
    '/p' takes the base origin; anything else joins the base path's
    directory. Dot-segment normalization ('../') is NOT performed
    (documented seam — canonical_url is the dedup key, and frontiers
    re-canonicalize after fetch)."""
    scheme = url_scheme(base)
    origin = F.concat(scheme, F.lit("://"), url_host(base))
    bdir = F.regexp_extract(
        F.when(url_path(base) == "", F.lit("/")).otherwise(url_path(base)),
        r"^(.*/)", 1,
    )
    return (
        F.when(ref.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), ref)
        .when(ref.startswith("//"), F.concat(scheme, F.lit(":"), ref))
        .when(ref.startswith("/"), F.concat(origin, ref))
        .otherwise(F.concat(origin, bdir, ref))
    )


def outlinks(df: DataFrame, url_col: str, html_col: str) -> DataFrame:
    """(page url, html) -> one row per resolved outlink: (src, dst,
    pos). Row-local explode — the frontier-expansion stage rides the
    fetch scan at any scale; dedup/canonicalize downstream."""
    refs = html_links(F.col(html_col))
    return df.select(
        F.col(url_col).alias("src"),
        F.posexplode(refs).alias("pos", "_ref"),
    ).select(
        "src",
        F.col("pos").cast("long").alias("pos"),
        resolve_url(F.col("src"), F.col("_ref")).alias("dst"),
    )


# ---------------------------------------------------------------------------
# sentence segmentation (rule-based, oracle-mirrored)
# ---------------------------------------------------------------------------

# one sentence = shortest run ending in terminal punctuation (with
# optional closing quotes/brackets) followed by whitespace or end; the
# final fragment without terminal punctuation is its own sentence.
# Java/RE2 common subset: no lookaround, non-greedy + anchored classes.
SENTENCE_RE = r"""[^.!?]*(?:[.!?]+['")\]]*|$)"""


def sentences(c: Column | str) -> Column:
    """Text -> array of trimmed sentences (rule-based segmentation for
    packing/chunking/sentence-level dedup — deterministic and mirrored
    in SQL, NOT a learned segmenter: abbreviations split, which is the
    documented trade every regex segmenter makes). Empty fragments
    drop."""
    x = F.col(c) if isinstance(c, str) else c
    raw = F.regexp_extract_all(x, F.lit(SENTENCE_RE), F.lit(0))
    # NOTE: F.transform(raw, F.trim) would bind trim's optional second
    # parameter to the element INDEX — always pass an explicit lambda
    return F.filter(
        F.transform(raw, lambda s: F.trim(s)), lambda s: s != ""
    )


def sentences_sql(expr: str) -> str:
    """The IDENTICAL segmentation as DuckDB SQL (RE2)."""
    p = SENTENCE_RE.replace("'", "''")
    return (
        f"list_filter(list_transform("
        f"regexp_extract_all({expr}, '{p}'), s -> trim(s)), s -> s <> '')"
    )


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


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309 Robots Exclusion Protocol)
# ---------------------------------------------------------------------------

ROBOTS_RULES_DDL = "host string, directive string, prefix string"


def parse_robots(txt: str, agent: str = "*") -> list[tuple[str, str]]:
    """RFC 9309 group selection + rule extraction: groups are runs of
    user-agent lines followed by rules; the group whose user-agent
    most specifically matches `agent` applies (exact match beats '*');
    comments stripped; empty-prefix allow/disallow ignored (an empty
    Disallow means allow-all). Rule paths pass through VERBATIM —
    wildcard interpretation ('*' any-sequence, trailing '$' anchor,
    RFC 9309 §2.2.3) happens in allowed_urls via rule_pattern, so the
    rule table stays a plain (host, directive, prefix) frame.

    Beyond the core protocol, the two publicly-documented de-facto
    extensions a polite crawler consumes:
      - ('crawl-delay', seconds) — per-group like allow/disallow, so
        it rides the same group selection;
      - ('sitemap', url) — group-INDEPENDENT per the sitemaps.org
        convention: returned for every agent, whichever group the
        line sits in."""
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, str]] = []
    sitemaps: list[str] = []
    in_group_header = True
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if not in_group_header:  # new group starts
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_header = True
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            if val:
                rules.append((key, val))
        elif key == "crawl-delay":
            in_group_header = False
            if val:
                rules.append((key, val))
        elif key == "sitemap":
            if val:
                sitemaps.append(val)
    if agents or rules:
        groups.append((agents, rules))
    agent = agent.lower()
    exact = [r for a, r in groups if agent in a]
    selected = (
        [x for r in exact for x in r]
        if exact
        else [x for r in (r for a, r in groups if "*" in a) for x in r]
    )
    return selected + [("sitemap", u) for u in sitemaps]


def robots_rules(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_txt) -> one (host, directive, prefix) row per
    applicable rule. Arrow map stage; the rule table is tiny (rules x
    hosts) and broadcast-joins against the URL set downstream."""
    import pandas as pd

    from pyspark.sql import DataFrame as _DF  # noqa: F401

    def run(batches):
        for pdf in batches:
            out = []
            for host, txt in zip(pdf[host_col], pdf[robots_col]):
                for directive, prefix in parse_robots(str(txt), agent):
                    out.append(
                        {"host": host, "directive": directive, "prefix": prefix}
                    )
            yield pd.DataFrame(out, columns=["host", "directive", "prefix"])

    return df.select(host_col, robots_col).mapInPandas(run, ROBOTS_RULES_DDL)


def rule_pattern(prefix: Column) -> Column:
    """RFC 9309 rule path -> anchored regex Column: '*' matches any
    character sequence, ONE trailing '$' anchors the end of the path,
    every other regex metacharacter is literal. Built as JVM
    expressions so the rule table needs no schema change and the
    conversion rides the broadcast."""
    anchored = prefix.endswith(F.lit("$"))
    body = F.when(
        anchored, F.regexp_replace(prefix, r"\$$", "")
    ).otherwise(prefix)
    esc = F.regexp_replace(body, r"([.\[\]{}()+?^$|\\])", r"\\$1")
    return F.concat(
        F.lit("^"),
        F.replace(esc, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def allowed_urls(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-URL robots verdict: host-keyed join against the rule table,
    most-specific match wins (longest rule by octet length — wildcard
    characters count, per RFC 9309 §2.2.2), allow wins length ties,
    no matching rule = allowed. Adds `allowed` boolean.

    Rules without wildcards match as plain prefixes (the fast path);
    rules carrying '*' or a trailing '$' match via rule_pattern — both
    shapes participate in the same length-precedence window.

    The verdict is computed over DISTINCT (host, path) pairs and
    joined back onto the input, so duplicate URLs (re-fetches are
    normal in crawl frames) each keep their own output row — and the
    window only ever sorts the distinct-path set, not the full frame.

    Scale: rules are per-HOST metadata (broadcast side); the verdict
    table is |distinct paths|-sized; the only full-frame shuffle is
    the final (host, path)-keyed join back."""
    from pyspark.sql import Window

    u = urls.withColumn("_host", url_host(url_col)).withColumn(
        "_path",
        F.when(url_path(url_col) == "", F.lit("/")).otherwise(url_path(url_col)),
    )
    paths = u.select("_host", "_path").distinct()
    r = rules.where(F.col("directive").isin("allow", "disallow")).select(
        F.col("host").alias("_rhost"),
        "directive",
        "prefix",
        (
            F.col("prefix").contains("*") | F.col("prefix").endswith("$")
        ).alias("_wild"),
        rule_pattern(F.col("prefix")).alias("_re"),
    )
    match = F.when(
        F.col("_wild"), F.regexp_like(F.col("_path"), F.col("_re"))
    ).otherwise(F.col("_path").startswith(F.col("prefix")))
    m = paths.join(
        F.broadcast(r),
        (F.col("_host") == F.col("_rhost")) & match,
        "left",
    )
    w = Window.partitionBy("_host", "_path").orderBy(
        F.length("prefix").desc(), F.col("directive").asc()
    )
    verdict = (
        m.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "_host",
            "_path",
            (
                F.col("directive").isNull() | (F.col("directive") == "allow")
            ).alias("allowed"),
        )
    )
    return u.join(verdict, ["_host", "_path"], "left").select(
        *urls.columns, F.coalesce("allowed", F.lit(True)).alias("allowed")
    )


def crawl_delays(rules: DataFrame, default: float = 0.0) -> DataFrame:
    """Rule table -> (host, crawl_delay): the selected group's
    Crawl-delay in seconds, `default` when absent or unparseable
    (MAX across duplicate lines — the conservative read). Per-host
    metadata, broadcast-sized like the rule table itself."""
    d = rules.where(F.col("directive") == "crawl-delay").select(
        "host",
        F.when(
            F.col("prefix").rlike(r"^[0-9]+(\.[0-9]+)?$"),
            F.col("prefix").cast("double"),
        ).alias("_d"),
    )
    return d.groupBy("host").agg(
        F.coalesce(F.max("_d"), F.lit(default)).alias("crawl_delay")
    )


def host_caps_weighted(
    urls: DataFrame,
    rules: DataFrame,
    base_cap: int,
    url_col: str = "url",
    budget_s: float = 3600.0,
    default_delay: float = 0.0,
) -> DataFrame:
    """Per-host crawl caps weighted by Crawl-delay: a host asking for
    d seconds between fetches can yield at most budget_s/d pages per
    crawl window, so its cap is min(base_cap, floor(budget_s /
    max(d, 1))) (d=0 or absent -> base_cap). Returns one row per host
    with (host, crawl_delay, cap, n_docs, n_kept) — the q_web_domain_
    caps rollup with the politeness budget applied. The delay table
    is broadcast; the window rides the rollup's own host exchange."""
    from pyspark.sql import Window

    hosts = urls.select(url_host(url_col).alias("host"), "*")
    delays = crawl_delays(rules, default_delay)
    withd = hosts.join(F.broadcast(delays), "host", "left").withColumn(
        "crawl_delay", F.coalesce("crawl_delay", F.lit(default_delay))
    )
    cap = F.when(
        F.col("crawl_delay") > 0,
        F.least(
            F.lit(base_cap),
            F.floor(F.lit(budget_s) / F.greatest(F.col("crawl_delay"), F.lit(1.0))),
        ),
    ).otherwise(F.lit(base_cap))
    w = Window.partitionBy("host").orderBy(F.col(url_col))
    return (
        withd.withColumn("_cap", cap)
        .withColumn("_rn", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.first("crawl_delay").alias("crawl_delay"),
            F.first("_cap").cast("long").alias("cap"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("_rn") <= F.col("_cap")).cast("long")).alias("n_kept"),
        )
    )


def sitemap_urls(rules: DataFrame) -> DataFrame:
    """Rule table -> (host, sitemap) rows — the crawl frontier's seed
    list (group-independent per the sitemaps.org convention)."""
    return rules.where(F.col("directive") == "sitemap").select(
        "host", F.col("prefix").alias("sitemap")
    )


# ---------------------------------------------------------------------------
# sitemap XML (sitemaps.org protocol)
# ---------------------------------------------------------------------------

# <loc> extraction in the Java/RE2 common subset (no lookaround); the
# sitemaps.org schema forbids nested elements inside <loc>, so a
# non-'<' body is the grammar, not an approximation.
SITEMAP_LOC_RE = r"<loc>\s*([^<]+?)\s*</loc>"


def sitemap_locs(c: Column | str) -> Column:
    """Sitemap XML -> array of <loc> URLs, document order. Works for
    both urlset (page URLs) and sitemapindex (child sitemap URLs)
    documents — the caller routes on sitemap_kind. Pure JVM regex,
    oracle-mirrored like html_to_text."""
    x = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(x, F.lit(SITEMAP_LOC_RE), F.lit(1))


# the ROOT element decides the document kind — an unanchored contains()
# misroutes a urlset whose comments/CDATA mention "<sitemapindex" back
# into the sitemap re-fetch loop. Skip XML declaration / comments /
# DOCTYPE, then capture the first real element name. Java/RE2 common
# subset: inline (?s), non-greedy, no lookaround.
SITEMAP_ROOT_RE = (
    r"(?s)^\s*(?:<\?.*?\?>\s*|<!--.*?-->\s*|<!DOCTYPE[^>]*>\s*)*"
    r"<(urlset|sitemapindex)[\s>]"
)


def sitemap_kind(c: Column | str) -> Column:
    """'index' for <sitemapindex> documents, 'urlset' for <urlset>,
    'unknown' otherwise — classified by the ROOT element, not a
    substring scan."""
    x = F.col(c) if isinstance(c, str) else c
    root = F.regexp_extract(x, SITEMAP_ROOT_RE, 1)
    return (
        F.when(root == "sitemapindex", F.lit("index"))
        .when(root == "urlset", F.lit("urlset"))
        .otherwise(F.lit("unknown"))
    )


def sitemap_frontier(df: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """(host, sitemap_xml) -> one frontier row per <loc>: (host, kind,
    loc, pos). The crawl-seed expansion stage: urlset rows feed the
    fetch queue directly; index rows are child sitemaps to fetch and
    re-expand. Row-local explode — free rider on the sitemap fetch
    scan at any scale."""
    locs = sitemap_locs(F.col(xml_col))
    return df.select(
        "host",
        sitemap_kind(F.col(xml_col)).alias("kind"),
        F.posexplode(locs).alias("pos", "loc"),
    ).select("host", "kind", F.col("pos").cast("long").alias("pos"), "loc")


# ---------------------------------------------------------------------------
# sitemap trees: gzipped payloads + nested sitemapindex (bounded)
# ---------------------------------------------------------------------------


def sitemap_decode(
    df: DataFrame, content_col: str = "content", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Fetched sitemap payload bytes -> XML text. `sitemap.xml.gz` is
    the dominant wild form (sitemaps.org allows gzip; crawlers MUST
    accept it), so payloads opening with the RFC 1952 magic are routed
    through the same member machinery the WARC reader uses
    (sources/warc.gzip_members — a whole-file single-member gzip is
    one member); plain XML passes through. Corrupt gzip degrades to
    an empty document (sitemap_kind 'unknown'), never an exception —
    the crawl-safe total-function stance. One Arrow stage, row-local;
    at 100 TB it rides the fetch scan like the WARC ingest decode."""
    import pandas as pd

    from corrie_spark.sources.warc import gzip_members

    cols = [c for c in df.columns if c != content_col]

    def decode(batches):
        for pdf in batches:
            xml = []
            for raw in pdf[content_col]:
                data = bytes(raw) if raw is not None else b""
                if data[:2] == b"\x1f\x8b":
                    data = b"".join(gzip_members(data))
                xml.append(data.decode("utf-8", errors="replace"))
            out = pdf[cols].copy()
            out[xml_col] = xml
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in cols]
        + [f"{xml_col} string"]
    )
    return df.mapInPandas(decode, schema)


def resolve_sitemap_tree(
    sitemaps: DataFrame,
    roots: DataFrame,
    max_depth: int = 4,
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """Depth-bounded sitemapindex expansion: starting from per-host
    root sitemaps (the robots `Sitemap:` directives), repeatedly
    fetch-and-expand — urlset <loc>s are page URLs (emitted with the
    level that produced them), sitemapindex <loc>s are child sitemaps
    to fetch next level. `sitemaps` is the fetched table
    (host, url, sitemap_xml); `roots` is (host, url).

    Bounded by construction: exactly `max_depth` join+explode levels
    (sitemaps.org convention is 1-2; the cap is the defense against
    hostile nesting), and a visited-set anti-join makes cycles — an
    index listing itself or an ancestor — contribute nothing instead
    of looping. No driver-side actions: the loop unrolls into one
    declarative plan, each level one broadcast-able join of a
    frontier (per-host metadata) against the sitemap table keyed by
    (host, url) plus a row-local explode; page bytes are never
    touched. Returns (host, loc, depth) — one row per page URL."""
    # Parse every fetched sitemap ONCE into a (host, url, kind, loc)
    # table and materialize it (round-15): the unrolled level plans
    # below reference their parents' lineage, so without the barrier
    # each level re-evaluates the XML kind/locs extraction of every
    # level above it (level count squared parses) and every broadcast
    # build drags the whole parse tree along. The parsed table is
    # per-host URL METADATA (no page bytes, no sitemap XML), the same
    # scale class as the frontier this operator already broadcasts.
    parsed = sitemaps.select(
        "host",
        "url",
        sitemap_kind(F.col(xml_col)).alias("kind"),
        F.explode(sitemap_locs(F.col(xml_col))).alias("loc"),
    ).localCheckpoint(eager=True)
    frontier = roots.select("host", "url")
    visited = frontier
    page_parts: list[DataFrame] = []
    for depth in range(max_depth):
        # the frontier (and the visited set it accumulates into) is
        # per-host URL metadata — broadcast it so each level is a
        # map-side probe of the sitemap table, no shuffle per level
        ex = parsed.join(F.broadcast(frontier), ["host", "url"]).select(
            "host", "kind", "loc"
        )
        page_parts.append(
            ex.where(F.col("kind") == "urlset").select(
                "host", "loc", F.lit(depth).cast("long").alias("depth")
            )
        )
        if depth + 1 == max_depth:
            break
        children = (
            ex.where(F.col("kind") == "index")
            .select("host", F.col("loc").alias("url"))
            .distinct()
        )
        frontier = children.join(F.broadcast(visited), ["host", "url"], "left_anti")
        visited = visited.unionByName(frontier)
    out = page_parts[0]
    for p in page_parts[1:]:
        out = out.unionByName(p)
    return out
