"""URL canonicalization / URL dedup unit tests."""

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.web import (
    canonical_url,
    url_canonicalize,
    url_dedup,
)


def _canon(spark, url):
    return (
        spark.range(1)
        .select(canonical_url(F.lit(url)).alias("c"))
        .collect()[0]["c"]
    )


@pytest.mark.parametrize(
    "raw,want",
    [
        # case + www + default port
        (
            "HTTPS://WWW.Example.COM:443/a/b",
            "https://example.com/a/b",
        ),
        ("http://example.com:80/", "http://example.com/"),
        # fragment dropped
        ("https://example.com/a#section-2", "https://example.com/a"),
        # tracking params dropped, remainder sorted
        (
            "https://example.com/p?utm_source=x&b=2&a=1&gclid=zz",
            "https://example.com/p?a=1&b=2",
        ),
        # ref= dropped, fbclid dropped
        (
            "https://example.com/p?ref=tw&fbclid=abc",
            "https://example.com/p",
        ),
        # trailing slash on non-root path stripped; root kept
        ("https://example.com/a/b/", "https://example.com/a/b"),
        ("https://example.com/", "https://example.com/"),
        ("https://example.com", "https://example.com/"),
        # params that merely START with 'ref' chars survive (refresh=1)
        (
            "https://example.com/p?refresh=1",
            "https://example.com/p?refresh=1",
        ),
        # utm must be prefix-anchored: 'xutm_a' survives
        (
            "https://example.com/p?xutm_a=1&utm_a=2",
            "https://example.com/p?xutm_a=1",
        ),
    ],
)
def test_canonical_url(spark, raw, want):
    assert _canon(spark, raw) == want


def test_refresh_not_ref(spark):
    # 'ref=' exactly, not every param starting with 'ref'
    assert (
        _canon(spark, "https://e.com/p?ref=abc&reference=x")
        == "https://e.com/p?reference=x"
    )


def test_url_dedup_keeps_best_quality(spark):
    rows = [
        (1, "https://WWW.example.com/a?utm_source=x", 100),
        (2, "https://example.com/a", 300),
        (3, "https://example.com/a/", 300),  # tie on quality -> min id
        (4, "https://example.com/b", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id int, url string, n_chars int")
    got = {
        r["canonical_url"]: (r["doc_id"], r["n_dups"])
        for r in url_dedup(df).collect()
    }
    assert got == {
        "https://example.com/a": (2, 3),
        "https://example.com/b": (4, 1),
    }


def test_canonicalize_adds_column(spark):
    df = spark.createDataFrame(
        [(1, "http://A.com/x/")], "doc_id int, url string"
    )
    out = url_canonicalize(df)
    assert out.columns == ["doc_id", "url", "canonical_url"]
    assert out.collect()[0]["canonical_url"] == "http://a.com/x"


def test_canonical_invariance_bulk(spark):
    """Invariance + idempotence over 200 constructed URLs: a clean URL
    and its messy variant (www + uppercase host + default port +
    trailing slash + shuffled params + tracking params + fragment)
    canonicalize identically, and canonicalization is idempotent."""
    import random

    rnd = random.Random(42)
    rows = []
    for i in range(200):
        scheme = rnd.choice(["http", "https"])
        host = f"h{rnd.randrange(50)}.example.org"
        segs = "/".join(f"s{rnd.randrange(9)}" for _ in range(rnd.randrange(4)))
        path = "/" + segs if segs else "/"
        params = [f"k{j}={rnd.randrange(9)}" for j in range(rnd.randrange(4))]
        clean_q = "&".join(sorted(params))
        clean = scheme + "://" + host + path + ("?" + clean_q if clean_q else "")
        messy_params = params[:]
        rnd.shuffle(messy_params)
        messy_params.insert(
            rnd.randrange(len(messy_params) + 1), f"utm_campaign=c{i}"
        )
        port = ":443" if scheme == "https" else ":80"
        messy = (
            scheme.upper()
            + "://WWW."
            + host.upper()
            + port
            + path
            + ("/" if path != "/" and rnd.random() < 0.5 else "")
            + "?"
            + "&".join(messy_params)
            + f"#frag{i}"
        )
        rows.append((i, clean, messy))
    df = spark.createDataFrame(rows, "i int, clean string, messy string")
    out = df.select(
        "i",
        canonical_url(F.col("clean")).alias("cc"),
        canonical_url(F.col("messy")).alias("cm"),
    ).withColumn("ccc", canonical_url(F.col("cc")))
    bad = out.where(
        (F.col("cc") != F.col("cm")) | (F.col("cc") != F.col("ccc"))
    ).collect()
    assert bad == [], bad[:5]


def test_robots_rules_grouping_and_filter_semantics(spark):
    """RFC 9309 subset: shared rule blocks after consecutive UA lines,
    comments, empty Disallow = allow-all, longest-prefix verdicts with
    Allow winning length ties, default allow for unknown domains."""
    from openeo_processes_dask_ml_spark.scale.web import (
        robots_filter,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
                "\nUser-agent: evil\nDisallow: /",
            ),
            (
                "b.com",
                "# hi\nUser-agent: bot\nUser-agent: *\nDisallow: /tmp\n"
                "Disallow:\nAllow: /tmp/keep",
            ),
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots)
    # consecutive UA lines share the block
    bot = {
        (r["prefix"], r["allow"])
        for r in rules.filter(F.col("agent") == "bot").collect()
    }
    assert bot == {("/tmp", False), ("", True), ("/tmp/keep", True)}
    # wildcard prefixes never match (stated boundary)
    urls = spark.createDataFrame(
        [
            ("https://a.com/private/x",),
            ("https://a.com/private/ok/y",),
            ("https://a.com/pub",),
            ("https://b.com/tmp/z",),
            ("https://b.com/tmp/keep/w",),
            ("https://c.com/any",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, rules, agent="*").collect()
    }
    assert got == {
        "https://a.com/private/x": False,
        "https://a.com/private/ok/y": True,
        "https://a.com/pub": True,
        "https://b.com/tmp/z": False,
        "https://b.com/tmp/keep/w": True,
        "https://c.com/any": True,
    }


def test_robots_star_fallback_for_named_agent(spark):
    """RFC 9309 §2.2.1: a named agent with no group of its own obeys
    the '*' group (review finding: first cut default-allowed)."""
    from openeo_processes_dask_ml_spark.scale.web import (
        robots_filter,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /"),
            ("b.com", "User-agent: mybot\nDisallow: /x\nUser-agent: *\nDisallow: /"),
            ("C.example", "User-agent: *\nDisallow: /s"),  # mixed-case domain
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots)
    urls = spark.createDataFrame(
        [
            ("https://a.com/anything",),
            ("https://b.com/x/1",),
            ("https://b.com/y",),
            ("https://c.example/s/2",),
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, rules, agent="mybot").collect()
    }
    assert got["https://a.com/anything"] is False  # * fallback applies
    assert got["https://b.com/x/1"] is False  # own group blocks /x
    assert got["https://b.com/y"] is True  # own group exists: * ignored
    assert got["https://c.example/s/2"] is False  # case-normalized domain


def test_robots_wildcards_and_crlf(spark):
    """RFC 9309 §2.2.3 wildcards ('*' any run, trailing '$' anchors)
    and CRLF bodies (ADVICE r13: must not leave '\\r' on values)."""
    from openeo_processes_dask_ml_spark.scale.web import (
        robots_filter,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\r\nDisallow: /*.pdf$\r\n"
                "Disallow: /tmp/*/x\r\nAllow: /tmp/ok/x\r\n"
                "Disallow: /exact$\r\nDisallow: /lit$eral\r\n",
            ),
        ],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("https://a.com/doc.pdf",),  # *.pdf$ blocks
            ("https://a.com/doc.pdfx",),  # $ anchor: not blocked
            ("https://a.com/tmp/z/x",),  # /tmp/*/x blocks
            ("https://a.com/tmp/ok/x",),  # Allow wins (longer pattern)
            ("https://a.com/exact",),  # anchored exact match blocks
            ("https://a.com/exact/sub",),  # past the anchor: allowed
            ("https://a.com/lit$eral/y",),  # internal '$' is literal
        ],
        "url string",
    )
    got = {
        r["url"]: r["allowed"]
        for r in robots_filter(urls, robots_rules(robots)).collect()
    }
    assert got == {
        "https://a.com/doc.pdf": False,
        "https://a.com/doc.pdfx": True,
        "https://a.com/tmp/z/x": False,
        "https://a.com/tmp/ok/x": True,
        "https://a.com/exact": False,
        "https://a.com/exact/sub": True,
        "https://a.com/lit$eral/y": False,
    }


def test_robots_filter_preserves_input_rows(spark):
    """Filter-shaped contract (ADVICE r13): duplicate input URLs must
    come back as duplicate rows, not be silently deduplicated."""
    from openeo_processes_dask_ml_spark.scale.web import (
        robots_filter,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p")],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("https://a.com/p/1",)] * 3 + [("https://a.com/q",)],
        "url string",
    )
    out = robots_filter(urls, robots_rules(robots)).collect()
    assert len(out) == 4
    assert sorted(r["allowed"] for r in out) == [False] * 3 + [True]


def test_html_extract_script_with_closing_tag_literal(spark):
    """'</div>' inside a JS string must not break the script strip
    (review finding: the char-class regex could not consume '</')."""
    from openeo_processes_dask_ml_spark.scale.web import html_text_extract

    h = (
        '<html><body><script>document.write("</div>")</script>'
        '<p>hi there</p><style>.a{content:"</b>"}</style>ok</body></html>'
    )
    df = spark.createDataFrame([(1, h)], "id long, html string")
    row = html_text_extract(df, "html", carry=("id",)).collect()[0]
    assert row["text"] == "hi there ok"
    assert row["n_tokens"] == 3


def test_robots_directives_delay_fallback_and_sitemaps(spark):
    """Crawl-delay: own group wins, '*' is the fallback, MIN across
    duplicates, unparseable values drop; sitemaps collect domain-wide
    (sorted, comma-joined), independent of groups."""
    from openeo_processes_dask_ml_spark.scale.web import robots_directives

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\r\nCrawl-delay: 3\r\nDisallow: /x\r\n"
                "Sitemap: https://a.com/s1.xml\r\n"
                "User-agent: fast\r\nCrawl-delay: 1.5\r\n"
                "Sitemap: https://a.com/s0.xml",
            ),
            ("b.com", "User-agent: *\nCrawl-delay: 10\nCrawl-delay: 4"),
            ("c.com", "User-agent: *\nDisallow: /\nSitemap: https://c.com/m.xml"),
            ("d.com", "User-agent: *\nCrawl-delay: soon"),  # unparseable
        ],
        "domain string, robots_txt string",
    )
    fast = {
        r["domain"]: (r["crawl_delay"], r["sitemaps"])
        for r in robots_directives(robots, agent="fast").collect()
    }
    assert fast["a.com"] == (1.5, "https://a.com/s0.xml,https://a.com/s1.xml")
    assert fast["b.com"] == (4.0, "")  # * fallback + MIN
    assert fast["c.com"] == (None, "https://c.com/m.xml")
    assert "d.com" not in fast  # nothing parseable, no sitemap

    star = {
        r["domain"]: r["crawl_delay"]
        for r in robots_directives(robots, agent="*").collect()
    }
    assert star["a.com"] == 3.0  # '*' group, not fast's


def test_robots_rules_unaffected_by_directive_lines(spark):
    """Crawl-delay/Sitemap lines must not leak into the rule table or
    break UA-group detection."""
    from openeo_processes_dask_ml_spark.scale.web import robots_rules

    robots = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: a\nCrawl-delay: 2\n"
                "User-agent: b\nDisallow: /q\nSitemap: https://a.com/s.xml",
            )
        ],
        "domain string, robots_txt string",
    )
    rules = robots_rules(robots).collect()
    # the UA 'b' line follows a crawl-delay line -> NEW group per the
    # RFC (a rule line ends the preceding group's UA run)
    assert {(r["agent"], r["prefix"]) for r in rules} == {("b", "/q")}


def test_sitemap_urls_kinds_and_trim(spark):
    from openeo_processes_dask_ml_spark.scale.web import sitemap_urls

    pages = spark.createDataFrame(
        [
            (
                "leaf",
                '<?xml version="1.0"?><urlset>'
                "<url><loc> https://a/1 </loc></url>"
                "<url><loc>https://a/2</loc></url></urlset>",
            ),
            (
                "idx",
                "<sitemapindex><sitemap><loc>https://a/s1.xml</loc>"
                "</sitemap></sitemapindex>",
            ),
            ("empty", "<urlset></urlset>"),  # no rows
        ],
        "source string, sitemap_xml string",
    )
    got = sorted(
        tuple(r) for r in sitemap_urls(pages, carry=("source",)).collect()
    )
    assert got == [
        ("idx", "index", "https://a/s1.xml"),
        ("leaf", "urlset", "https://a/1"),
        ("leaf", "urlset", "https://a/2"),
    ]
