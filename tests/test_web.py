"""operators/web.py unit pins: HTML extraction edge cases, URL
parsing/canonicalization corners, registered-domain suffix handling —
the row-local crawl stages between WARC ingestion and documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from corrie_spark.operators import web as W


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).collect()[0].v


def test_html_strip_basics(spark):
    html = (
        '<html><head><title>T</title><script>if (1 < 2) alert("x")</script>'
        "<style>p { a: b; }</style></head>"
        "<body><h1>Head</h1><p>one</p><p>two &amp; three</p>"
        "<!-- <p>never</p> --></body></html>"
    )
    out = _one(spark, W.html_to_text(F.lit(html)))
    assert out == "T Head one two & three"


def test_html_malformed_degrades_not_raises(spark):
    # tag soup: unclosed tags, stray '<', nested brokenness
    html = "<p>a < b</p><div><span>c</div> trailing <"
    out = _one(spark, W.html_to_text(F.lit(html)))
    assert "a" in out and "c" in out and "trailing" in out


def test_entity_order_amp_last(spark):
    # '&amp;lt;' must decode to the LITERAL '&lt;', not '<'
    out = _one(spark, W.html_to_text(F.lit("x &amp;lt; y &nbsp;z")))
    assert out == "x &lt; y z"


def test_url_parts_and_canonical(spark):
    u = F.lit("HTTPS://User.Example.CO.UK:443/A/b?utm_source=t&z=2&a=1#frag")
    assert _one(spark, W.url_scheme(u)) == "https"
    assert _one(spark, W.url_host(u)) == "user.example.co.uk"
    assert _one(spark, W.registered_domain(W.url_host(u))) == "example.co.uk"
    assert (
        _one(spark, W.canonical_url(u))
        == "https://user.example.co.uk/A/b?a=1&z=2"
    )


def test_canonical_keeps_nondefault_port_and_empty_path(spark):
    u = F.lit("http://Host.Example.com:8080")
    assert _one(spark, W.canonical_url(u)) == "http://host.example.com:8080/"
    u2 = F.lit("http://h.example.com:80?b=1")
    assert _one(spark, W.canonical_url(u2)) == "http://h.example.com/?b=1"


def test_canonical_drops_all_tracking(spark):
    u = F.lit("https://a.example.com/p?utm_source=x&utm_medium=y&fbclid=z&gclid=1")
    assert _one(spark, W.canonical_url(u)) == "https://a.example.com/p"


def test_registered_domain_plain_and_short(spark):
    assert _one(spark, W.registered_domain(F.lit("a.b.site.com"))) == "site.com"
    assert _one(spark, W.registered_domain(F.lit("site.com"))) == "site.com"
    assert _one(spark, W.registered_domain(F.lit("localhost"))) == "localhost"
    assert (
        _one(spark, W.registered_domain(F.lit("deep.sub.shop.com.au")))
        == "shop.com.au"
    )


def test_fixture_page_python_sql_twins_agree(spark):
    # the python builder (feeds the WARC fixture encoder) and the SQL
    # template (feeds the oracle) must construct IDENTICAL strings
    rows = spark.createDataFrame(
        [(3, "alpha beta"), (11, 'quo "ted" & amp')],
        "doc_id long, text string",
    ).select("doc_id", "text", F.expr(W.FIXTURE_PAGE_TMPL.format(S="STRING")).alias("h"))
    for r in rows.collect():
        assert r.h == W.fixture_page(r.doc_id, r.text)


def test_parse_robots_groups_and_precedence():
    txt = (
        "# policy\nUser-agent: megabot\nDisallow: /\n\n"
        "User-agent: a\nUser-agent: b\nDisallow: /x\n\n"
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\nDisallow:\n"
    )
    assert W.parse_robots(txt) == [
        ("disallow", "/private/"),
        ("allow", "/private/pub/"),
    ]
    assert W.parse_robots(txt, "MegaBot") == [("disallow", "/")]
    assert W.parse_robots(txt, "b") == [("disallow", "/x")]
    assert W.parse_robots("", "x") == []


def test_allowed_urls_longest_match_allow_wins(spark):
    urls = spark.createDataFrame(
        [
            ("https://h.example.com/private/secret",),
            ("https://h.example.com/private/pub/page",),
            ("https://h.example.com/open",),
            ("https://other.example.com/private/secret",),  # no rules host
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("h.example.com", "disallow", "/private/"),
            ("h.example.com", "allow", "/private/pub/"),
        ],
        "host string, directive string, prefix string",
    )
    got = {r.url: r.allowed for r in W.allowed_urls(urls, rules).collect()}
    assert got == {
        "https://h.example.com/private/secret": False,
        "https://h.example.com/private/pub/page": True,
        "https://h.example.com/open": True,
        "https://other.example.com/private/secret": True,
    }

def test_allowed_urls_keeps_duplicate_urls(spark):
    # re-fetches (same URL appearing on multiple rows) are normal in
    # crawl frames — the verdict join must preserve ONE OUTPUT ROW PER
    # INPUT ROW, not collapse duplicates (regression: the old window
    # over url_col kept only row_number()==1 per URL string)
    urls = spark.createDataFrame(
        [
            (1, "https://h.example.com/private/secret"),
            (2, "https://h.example.com/private/secret"),  # dup URL
            (3, "https://h.example.com/open"),
            (4, "https://h.example.com/open"),  # dup URL
            (5, "https://h.example.com/open"),  # dup URL
        ],
        "rid long, url string",
    )
    rules = spark.createDataFrame(
        [("h.example.com", "disallow", "/private/")],
        "host string, directive string, prefix string",
    )
    rows = W.allowed_urls(urls, rules).collect()
    assert len(rows) == 5
    got = {r.rid: r.allowed for r in rows}
    assert got == {1: False, 2: False, 3: True, 4: True, 5: True}


def test_parse_robots_crawl_delay_and_sitemap():
    txt = (
        "User-agent: megabot\nDisallow: /\nCrawl-delay: 99\n"
        "Sitemap: https://h/s1.xml\n\n"
        "User-agent: *\nDisallow: /x\nCrawl-delay: 4\n"
        "Sitemap: https://h/s2.xml\n"
    )
    got = W.parse_robots(txt)
    # generic group's rules + delay; sitemaps are group-INDEPENDENT
    assert ("disallow", "/x") in got
    assert ("crawl-delay", "4") in got
    assert ("crawl-delay", "99") not in got
    assert ("sitemap", "https://h/s1.xml") in got
    assert ("sitemap", "https://h/s2.xml") in got
    # exact agent selects its own delay, still both sitemaps
    mb = W.parse_robots(txt, "megabot")
    assert ("crawl-delay", "99") in mb and ("sitemap", "https://h/s2.xml") in mb


def test_crawl_delays_and_sitemaps_tables(spark):
    rules = spark.createDataFrame(
        [
            ("a.com", "crawl-delay", "2.5"),
            ("a.com", "crawl-delay", "7"),  # conservative MAX wins
            ("a.com", "sitemap", "https://a.com/s.xml"),
            ("b.com", "disallow", "/x"),
            ("c.com", "crawl-delay", "junk"),  # unparseable -> default
        ],
        "host string, directive string, prefix string",
    )
    d = {r.host: r.crawl_delay for r in W.crawl_delays(rules).collect()}
    assert d == {"a.com": 7.0, "c.com": 0.0}
    s = {(r.host, r.sitemap) for r in W.sitemap_urls(rules).collect()}
    assert s == {("a.com", "https://a.com/s.xml")}


def test_allowed_urls_ignores_non_path_directives(spark):
    urls = spark.createDataFrame(
        [("https://a.com/page",)], "url string"
    )
    rules = spark.createDataFrame(
        [("a.com", "crawl-delay", "4"), ("a.com", "sitemap", "https://a.com/s")],
        "host string, directive string, prefix string",
    )
    # delay/sitemap rows must not act as path prefixes
    got = W.allowed_urls(urls, rules).collect()
    assert len(got) == 1 and got[0].allowed is True


def test_host_caps_weighted_budget(spark):
    urls = spark.createDataFrame(
        [(f"https://{h}/p{i}",) for h in ("slow.com", "fast.com") for i in range(8)],
        "url string",
    )
    rules = spark.createDataFrame(
        [("slow.com", "crawl-delay", "4")],
        "host string, directive string, prefix string",
    )
    got = {
        r.host: (r.crawl_delay, r.cap, r.n_docs, r.n_kept)
        for r in W.host_caps_weighted(urls, rules, base_cap=5, budget_s=10.0).collect()
    }
    assert got["slow.com"] == (4.0, 2, 8, 2)   # floor(10/4) = 2
    assert got["fast.com"] == (0.0, 5, 8, 5)   # base cap


def test_sitemap_frontier_kinds_and_order(spark):
    urlset = (
        '<?xml version="1.0"?><urlset xmlns="x">'
        "<url><loc> https://a.com/p1 </loc><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>https://a.com/p2</loc></url></urlset>"
    )
    index = (
        '<?xml version="1.0"?><sitemapindex xmlns="x">'
        "<sitemap><loc>https://b.com/s1.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.com", urlset), ("b.com", index)], "host string, sitemap_xml string"
    )
    rows = {(r.host, r.kind, r.pos, r.loc) for r in W.sitemap_frontier(df).collect()}
    assert rows == {
        ("a.com", "urlset", 0, "https://a.com/p1"),
        ("a.com", "urlset", 1, "https://a.com/p2"),
        ("b.com", "index", 0, "https://b.com/s1.xml"),
    }


def test_sitemap_kind_root_element(spark):
    """Classification is by ROOT element: a urlset mentioning
    '<sitemapindex' in a comment must not be misrouted into the
    index re-fetch loop."""
    tricky_urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        "<!-- generated; see <sitemapindex> docs at sitemaps.org -->\n"
        '<urlset xmlns="x"><url><loc>https://a.com/p</loc></url></urlset>'
    )
    tricky_index = (
        "<!DOCTYPE sitemapindex>\n<sitemapindex xmlns='x'>"
        "<sitemap><loc>https://b.com/u.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    not_xml = "just text mentioning <urlset nowhere near the root? no:"
    html = "<html><body><urlset></urlset></body></html>"
    df = spark.createDataFrame(
        [(tricky_urlset,), (tricky_index,), (not_xml,), (html,)], "x string"
    )
    got = [r.k for r in df.select(W.sitemap_kind("x").alias("k")).collect()]
    assert got == ["urlset", "index", "unknown", "unknown"]


def test_robots_wildcard_and_anchor_matching(spark):
    """RFC 9309 §2.2.3 special characters: '*' any-sequence, trailing
    '$' end-anchor, precedence by rule octet length (wildcards count),
    other regex metachars literal."""
    urls = spark.createDataFrame(
        [
            (f"https://h.example.com{p}",)
            for p in [
                "/fish", "/fish.html", "/fishheads/yummy.html",
                "/Fish.asp",  # case-sensitive: no rule matches
                "/fish/salmon.php",  # longer allow overrides
                "/docs/page.htm", "/docs/page.html",  # anchor holds
                "/a/b.php", "/a/b.php.bak",
                "/x(1).txt",  # parens are literal in rules
            ]
        ],
        "url string",
    )
    rules = spark.createDataFrame(
        [
            ("h.example.com", "disallow", "/fish*"),
            ("h.example.com", "allow", "/fish/salmon*"),
            ("h.example.com", "disallow", "/*.htm$"),
            ("h.example.com", "disallow", "/a/*.php$"),
            ("h.example.com", "disallow", "/x(1).txt"),
        ],
        "host string, directive string, prefix string",
    )
    got = {
        r.url.split(".com", 1)[1]: r.allowed
        for r in W.allowed_urls(urls, rules).collect()
    }
    assert got == {
        "/fish": False,
        "/fish.html": False,
        "/fishheads/yummy.html": False,
        "/Fish.asp": True,
        "/fish/salmon.php": True,
        "/docs/page.htm": False,
        "/docs/page.html": True,
        "/a/b.php": False,
        "/a/b.php.bak": True,
        "/x(1).txt": False,
    }


def test_markdown_to_text_strips_structure(spark):
    md = (
        "# Title here\n\n"
        "Some **bold** and __also bold__ text with [a link](https://x/y) "
        "and ![an image](https://x/i.png) plus `inline code`.\n\n"
        "```python\nprint('kept')\n```\n\n"
        "- item one\n* item two\n+ item three\n\n"
        "> quoted line\n\n---\n\nend"
    )
    out = _one(spark, W.markdown_to_text(F.lit(md)))
    assert out == (
        "Title here Some bold and also bold text with a link and an image "
        "plus inline code. print('kept') item one item two item three "
        "quoted line end"
    )


def test_fixture_markdown_extracts_to_token_stream(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta iota " * 3
    for did in range(6):  # every decoration mode leads at least once
        md = W.fixture_markdown(did, text)
        out = _one(spark, W.markdown_to_text(F.lit(md)))
        assert out == " ".join(t for t in text.split(" ") if t)


def test_sentences_rule_and_cross_engine(spark):
    import duckdb

    cases = [
        "One. Two! Three? Done",
        'He said "stop." Then left.',
        "No terminal punctuation here",
        "Ellipsis... then more.  Double  spaces. ",
        "(Bracketed.) [Sq.] End",
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [r.s for r in df.select(W.sentences("t").alias("s")).collect()]
    assert got[0] == ["One.", "Two!", "Three?", "Done"]
    assert got[1] == ['He said "stop."', "Then left."]
    assert got[3] == ["Ellipsis...", "then more.", "Double  spaces."]
    assert got[5] == []
    con = duckdb.connect()
    for c, g in zip(cases, got):
        o = con.execute("SELECT " + W.sentences_sql("$1"), [c]).fetchone()[0]
        assert list(o) == list(g), c


def test_outlinks_resolution_shapes(spark):
    html = (
        '<html><a href="https://other.org/x">abs</a>'
        '<a href="/root/y">pathabs</a>'
        "<a href='sub/z'>rel</a>"
        '<a href="//cdn.net/c">proto</a>'
        '<a href="#frag">skip</a>'
        "<a name='no-href'>skip too</a></html>"
    )
    df = spark.createDataFrame(
        [("https://www.h.example.com/dir/page", html)], "url string, h string"
    )
    got = [
        (r.pos, r.dst)
        for r in W.outlinks(df, "url", "h").orderBy("pos").collect()
    ]
    assert got == [
        (0, "https://other.org/x"),
        (1, "https://www.h.example.com/root/y"),
        (2, "https://www.h.example.com/dir/sub/z"),
        (3, "https://cdn.net/c"),
    ]


def test_sitemap_decode_gz_and_corrupt(spark):
    import gzip

    xml = b'<?xml version="1.0"?><urlset><url><loc>https://h/x</loc></url></urlset>'
    rows = [
        ("h", "https://h/plain.xml", xml),
        ("h", "https://h/ok.xml.gz", gzip.compress(xml)),
        ("h", "https://h/bad.xml.gz", b"\x1f\x8b\x08" + b"\x00" * 20),
    ]
    df = spark.createDataFrame(rows, "host string, url string, content binary")
    got = {r.url: r.sitemap_xml for r in W.sitemap_decode(df).collect()}
    assert got["https://h/plain.xml"] == xml.decode()
    assert got["https://h/ok.xml.gz"] == xml.decode()
    # corrupt gzip degrades to an empty document, never raises
    assert got["https://h/bad.xml.gz"] == ""
    kinds = W.sitemap_decode(df).select(
        "url", W.sitemap_kind(F.col("sitemap_xml")).alias("k")
    )
    assert {r.url: r.k for r in kinds.collect()}["https://h/bad.xml.gz"] == "unknown"


def test_resolve_sitemap_tree_cycle_and_depth_bound(spark):
    def index(children):
        return "<sitemapindex>" + "".join(
            f"<sitemap><loc>{c}</loc></sitemap>" for c in children
        ) + "</sitemapindex>"

    def urlset(pages):
        return "<urlset>" + "".join(
            f"<url><loc>{p}</loc></url>" for p in pages
        ) + "</urlset>"

    # root -> (a, cycle-back-to-root) ; a -> (b) ; b -> pages ; plus a
    # LONG chain root2 -> i1 -> i2 -> i3 -> deep pages (i3's urlset is
    # fetched at level 3, so max_depth=3 cuts it and max_depth=4 keeps it)
    rows = [
        ("h", "https://h/sitemap.xml", index(["https://h/a.xml", "https://h/sitemap.xml"])),
        ("h", "https://h/a.xml", index(["https://h/b.xml"])),
        ("h", "https://h/b.xml", urlset(["https://h/p1", "https://h/p2"])),
        ("g", "https://g/sitemap.xml", index(["https://g/i1.xml"])),
        ("g", "https://g/i1.xml", index(["https://g/i2.xml"])),
        ("g", "https://g/i2.xml", index(["https://g/i3.xml"])),
        ("g", "https://g/i3.xml", urlset(["https://g/deep"])),
    ]
    sitemaps = spark.createDataFrame(
        rows, "host string, url string, sitemap_xml string"
    )
    roots = spark.createDataFrame(
        [("h", "https://h/sitemap.xml"), ("g", "https://g/sitemap.xml")],
        "host string, url string",
    )
    got = sorted(
        (r.host, r.loc, r.depth)
        for r in W.resolve_sitemap_tree(sitemaps, roots, max_depth=3).collect()
    )
    # the cycle double-counts nothing; g's depth-3 urlset is cut by the bound
    assert got == [("h", "https://h/p1", 2), ("h", "https://h/p2", 2)]
    # one level deeper and g's chain resolves
    got4 = sorted(
        (r.host, r.loc, r.depth)
        for r in W.resolve_sitemap_tree(sitemaps, roots, max_depth=4).collect()
    )
    assert ("g", "https://g/deep", 3) in got4 and len(got4) == 3


def test_latex_to_text_rules(spark):
    """Each LATEX_STEPS rule pinned on a hand-written case, plus the
    poison stance (malformed input never raises)."""
    cases = [
        ("\\section{Intro}", "Intro"),
        ("\\textbf{bold} text", "bold text"),
        ("a \\cite{x} b", "a b"),
        ("keep 50\\% off", "keep 50% off"),
        ("line % a comment\nnext", "line next"),
        ("pre $x^2+y$ post", "pre post"),
        ("pre $$\\int f$$ post", "pre post"),
        ("pre \\[ e=mc^2 \\] post", "pre post"),
        ("\\begin{itemize}\\item one\\end{itemize}", "one"),
        ("\\href{https://x.org}{link text} t", "link text t"),
        ("\\usepackage[utf8]{inputenc}body", "body"),
        ("a\\\\b", "a b"),
        ("Tom \\& Jerry \\_x", "Tom & Jerry _x"),
        ("{grouped} words", "grouped words"),
        ("\\emph{kept}~word", "kept word"),
        ("\\documentclass[11pt]{article}x", "x"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "tex string")
    got = [r[0] for r in df.select(W.latex_to_text("tex")).collect()]
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g, want)
    # poison: unbalanced/degenerate inputs degrade, never raise
    bad = ["\\begin{x", "$unclosed", "\\cmd{a{b}}", "%" * 5, "\\", ""]
    bdf = spark.createDataFrame([(b,) for b in bad], "tex string")
    assert len(bdf.select(W.latex_to_text("tex")).collect()) == len(bad)


def test_fixture_latex_extraction_identity(spark):
    """The fixture twin contract: extracted text == token stream for
    every decoration mode (ids sweep all 8 rotations)."""
    text = " ".join(f"tok{i}" for i in range(40))
    rows = [(i, text, W.fixture_latex(i, text)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tex string")
    got = df.select("doc_id", W.latex_to_text("tex").alias("ex")).collect()
    want = " ".join(text.split())
    for r in got:
        assert r.ex == want, r.doc_id
