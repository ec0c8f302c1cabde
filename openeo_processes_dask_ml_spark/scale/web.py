"""URL canonicalization and URL-based deduplication — the first
dedup stage of every web-crawl training pipeline (CommonCrawl / CCNet
/ RefinedWeb dedupe by normalized URL before any content hashing).

All transforms are built-in string/array functions (regexp_extract,
filter, array_sort, array_join) — pure whole-stage codegen, no UDFs,
map-side combinable. The regexes are RE2-safe (no lookbehind or
backreferences) so a DuckDB oracle can mirror them verbatim.

Normalization steps (each one is load-bearing in real crawls):
  1. scheme and host lowercased; leading ``www.`` stripped
  2. explicit default ports ``:80`` / ``:443`` stripped
  3. fragment (``#...``) dropped
  4. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
     ``ref``), remaining params sorted for order-insensitivity
  5. trailing slash on a non-root path stripped
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.tuning import local_rows_df

# RE2-safe pieces shared with the DuckDB oracle (__spark_entry__.py)
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
TRACKING_PARAM_RE = "^(utm_|fbclid=|gclid=|ref=)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` as a Column expression.

    Malformed inputs (no ``scheme://``) degrade deterministically:
    every regexp_extract misses, producing ``":///"``-style keys —
    identical in Spark and the DuckDB oracle, so such rows group
    together rather than erroring (crawl data always contains some)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = F.regexp_replace(host, "^www\\.", "")
    host = F.regexp_replace(host, ":(80|443)$", "")
    path = F.regexp_extract(url, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def url_canonicalize(
    df: DataFrame, url_col: str = "url", out_col: str = "canonical_url"
) -> DataFrame:
    return df.withColumn(out_col, canonical_url(F.col(url_col)))


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """One row per canonical URL: (canonical_url, doc_id of the kept
    document, n_dups, *carry). Keeper = highest ``quality_col``, ties
    to the lowest id — a single window over the canonical-URL hash
    partition (distributed; no skew risk beyond genuine URL hot-spots,
    which at crawl scale are bounded by per-site page counts).

    ``carry`` names extra columns to keep on the survivor rows: they
    ride the one window shuffle instead of a second join-back shuffle
    of the whole table — the cheaper plan whenever a downstream stage
    needs them (see q_pipeline_web_ingest)."""
    canon = url_canonicalize(df, url_col).select(
        "canonical_url",
        F.col(id_col).alias("doc_id"),
        F.col(quality_col).alias("q"),
        *carry,
    )
    w = Window.partitionBy("canonical_url").orderBy(
        F.desc("q"), F.asc("doc_id")
    )
    return (
        canon.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_dups", F.count("*").over(Window.partitionBy("canonical_url"))
        )
        .where(F.col("rn") == 1)
        .select("canonical_url", "doc_id", "n_dups", *carry)
    )


def _pagerank_driver(
    spark, edge_rows, n_domains: int, iters: int, damping: float,
    teleport: float,
) -> DataFrame:
    """Driver-side tier of ``domain_pagerank`` (edge table under the
    bound): the SAME power iteration, each float accumulation a
    sequential loop in the SAME order the distributed tier folds —
    dangling mass over domains ascending, per-dst contributions over
    src ascending, term spelled rank*cnt/outdeg with the identical
    IEEE op order — so both tiers and the SQL oracle replay are
    bit-identical, not merely close."""
    outdeg: dict[int, float] = {}
    by_dst: dict[int, list] = {}
    for r in edge_rows:
        s, d, cnt = int(r["s"]), int(r["d"]), float(r["cnt"])
        outdeg[s] = outdeg.get(s, 0.0) + cnt
        by_dst.setdefault(d, []).append((s, cnt))
    for lst in by_dst.values():
        lst.sort()  # fold order: src ascending (the sort_array order)
    dangling = sorted(set(range(n_domains)) - set(outdeg))
    rank = [1.0 / float(n_domains)] * n_domains
    for _ in range(iters):
        m = 0.0
        for dom in dangling:  # domain ascending (struct sort order)
            m = m + rank[dom]
        new = []
        for dom in range(n_domains):
            c = 0.0
            for s, cnt in by_dst.get(dom, ()):
                c = c + rank[s] * cnt / outdeg[s]
            new.append(
                teleport + damping * (c + m / float(n_domains))
            )
        rank = new
    import math

    q = [int(math.floor(r * 1e6 + 0.5)) for r in rank]
    order = sorted(range(n_domains), key=lambda d: (-q[d], d))
    rows = [
        (d, float(q[d]) / 1e6, pos + 1) for pos, d in enumerate(order)
    ]
    return local_rows_df(
        spark, rows, "domain bigint, rank double, pos int"
    )


def domain_pagerank(
    docs: DataFrame,
    n_domains: int = 97,
    iters: int = 8,
    damping: float = 0.85,
    id_col: str = "doc_id",
    max_driver_edges: int = 2_000_000,
) -> DataFrame:
    """PageRank over a crawl domain graph — the canonical crawl-
    prioritization signal (CommonCrawl publishes exactly this family
    of host/domain rank lists; a training-data pipeline uses it to
    weight or filter sources before ingest). Beyond-reference surface,
    same bucket as the dedup/ANN family.

    The gate derives a DETERMINISTIC synthetic edge list from the
    documents table (src domain = doc_id mod n, dst = md5-hash mod n —
    the raster-gate posture: the graph is synthetic, the OPERATOR is
    real), then runs ``iters`` damped power-iteration rounds with
    proper dangling-mass redistribution.

    100 TB shape: the expensive stage is the corpus -> edge-list
    aggregation (ONE shuffle, map-side combined). The iteration state
    is DOMAIN-graph-sized, orders of magnitude below the corpus, so
    it takes the dup_clusters two-tier shape (r15): when the
    aggregated edge table fits a bound (``max_driver_edges``, checked
    on the checkpointed aggregate — one cheap count), the power
    iteration runs driver-side in a tight loop that replicates the
    distributed arithmetic operation-for-operation, deleting 8
    rounds of job scheduling + checkpoints; above the bound, the
    distributed loop runs: each iteration a broadcast join of the
    rank vector into the edge table plus a tiny per-dst aggregation,
    ``localCheckpoint``ed to keep the plan from doubling per round
    (the bpe_merges posture). Nothing all-pairs; the driver only ever
    holds the bounded aggregate, never per-doc data. Both tiers are
    pinned equal by a unit test and both replay bit-identically in
    the oracle.

    Float posture (the ann_ivf_trained/dsir discipline): every
    accumulation is a FOLD-ORDERED ``sort_array + F.aggregate`` sum
    (per-dst contributions ordered by src, dangling mass ordered by
    domain), and the final ordering quantizes before ranking
    (``floor(rank*1e6+0.5)`` as BIGINT), so the oracle replay is
    bit-identical, not merely close."""
    from openeo_processes_dask_ml_spark.scale.dedup import hash60

    spark = docs.sparkSession
    teleport = (1.0 - damping) / n_domains

    ids = docs.select(F.col(id_col).alias("id"))
    edges = (
        ids.select(
            F.pmod(F.col("id"), F.lit(n_domains)).alias("s"),
            F.pmod(
                hash60(F.col("id").cast("string"), "pr"), F.lit(n_domains)
            ).alias("d"),
        )
        .filter(F.col("s") != F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # ONE corpus scan: edges materialize first, then outdeg and the
    # joined table derive from the checkpointed edges — and outdeg is
    # ALSO checkpointed because every iteration's dangling-mass anti
    # join reads it (un-checkpointed it would re-derive from the
    # corpus 8 times)
    edges = edges.localCheckpoint()
    if edges.count() <= max_driver_edges:
        return _pagerank_driver(
            spark, edges.collect(), n_domains, iters, damping, teleport
        )
    outdeg = (
        edges.groupBy("s").agg(F.sum("cnt").alias("outdeg")).localCheckpoint()
    )
    edges_n = edges.join(outdeg, "s").localCheckpoint()

    universe = spark.range(n_domains).select(F.col("id").alias("domain"))
    rank = universe.select(
        "domain", (F.lit(1.0) / F.lit(float(n_domains))).alias("rank")
    ).localCheckpoint()

    for _ in range(iters):
        dang = (
            rank.join(outdeg, rank["domain"] == outdeg["s"], "left_anti")
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("domain", "rank"))),
                    F.lit(0.0),
                    lambda a, x: a + x["rank"],
                ).alias("m")
            )
        )
        contrib = (
            edges_n.join(F.broadcast(rank), edges_n["s"] == rank["domain"])
            .select(
                F.col("d").alias("domain"),
                F.col("s"),
                (
                    F.col("rank") * F.col("cnt").cast("double")
                    / F.col("outdeg")
                ).alias("term"),
            )
            .groupBy("domain")
            .agg(
                F.aggregate(
                    F.sort_array(F.collect_list(F.struct("s", "term"))),
                    F.lit(0.0),
                    lambda a, x: a + x["term"],
                ).alias("c")
            )
        )
        rank = (
            universe.join(contrib, "domain", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "domain",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("m") / F.lit(float(n_domains))
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )

    # final global ordering through the pure-function bucketed ordinal
    # (r14 — the last Window.orderBy() single-partition rank in the
    # repo; domains-sized so it was only cosmetic, but it warned on
    # every run and the scale-safe spelling costs nothing here)
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        global_sorted_index,
    )

    qrank = F.floor(F.col("rank") * F.lit(1e6) + F.lit(0.5)).cast("bigint")
    ranked = global_sorted_index(
        rank.select("domain", qrank.alias("q")),
        [("q", "desc"), ("domain", "asc")],
        rank_col="__pos",
    )
    return ranked.select(
        "domain",
        (F.col("q").cast("double") / F.lit(1e6)).alias("rank"),
        (F.col("__pos") + 1).cast("int").alias("pos"),
    )


# RE2-safe (and Java-regex-identical) HTML pieces, mirrored verbatim
# by the DuckDB oracle. Deliberately the simple crawl-extraction
# subset: tags stripped, entities NOT decoded (a decode table is a
# dictionary join, orthogonal to the shape), scripts/styles removed
# whole before the generic tag strip. Script and style strip in TWO
# non-greedy dotall passes — a single alternation with a char-class
# body could not consume '</' inside JS string literals and allowed
# <script> to close with </style> (caught in review; RE2 has no
# backreferences, so per-tag passes instead of a \1 closer).
_TITLE_RE = "<title>([^<]*)</title>"
_SCRIPT_RE = "(?s)<script[^>]*>.*?</script>"
_STYLE_RE = "(?s)<style[^>]*>.*?</style>"
_TAG_RE = "<[^>]+>"
_WS_RE = r"\s+"


def html_text_extract(
    df: DataFrame, html_col: str = "html", carry: tuple[str, ...] = ()
) -> DataFrame:
    """Crawl-style HTML -> text extraction, entirely JVM-side
    (regexp_extract / regexp_replace — whole-stage codegen, no UDFs,
    so it runs at scan speed over 100 TB of payloads): title from the
    <title> element, body text with script/style blocks dropped
    whole, all tags flattened to spaces, whitespace normalized. The
    regex subset is RE2-safe so the SQL oracle replays it verbatim.

    Returns ``carry`` columns + title, text, n_tokens (whitespace
    tokens of the extracted text — the corpus-side token_count
    semantics)."""
    html = F.col(html_col)
    no_scripts = F.regexp_replace(
        F.regexp_replace(html, _SCRIPT_RE, " "), _STYLE_RE, " "
    )
    text = F.trim(
        F.regexp_replace(
            F.regexp_replace(no_scripts, _TAG_RE, " "), _WS_RE, " "
        )
    )
    out = df.select(
        *carry,
        F.regexp_extract(html, _TITLE_RE, 1).alias("title"),
        text.alias("text"),
    )
    return out.withColumn(
        "n_tokens",
        F.when(F.col("text") == "", F.lit(0)).otherwise(
            F.size(F.split(F.col("text"), " "))
        ).cast("bigint"),
    )


def sitemap_urls(
    df: DataFrame, xml_col: str = "sitemap_xml", carry: tuple[str, ...] = ()
) -> DataFrame:
    """Crawl-frontier feeder (NEW r14, the consumer of
    ``robots_directives``' sitemap pointers): extract ``<loc>``
    entries from sitemap XML bodies — both ``<urlset>`` leaf sitemaps
    and ``<sitemapindex>`` index files (``kind`` tells which, so a
    frontier can loop: index -> fetch -> extract again). Entirely
    RE2-safe ``regexp_extract_all`` codegen (runs at scan speed over
    crawled sitemap payloads; no XML parser in the path — attribute
    or CDATA exotica are out of the regex subset and stated).
    Returns ``carry`` columns + (kind, url), one row per <loc>."""
    kind = F.when(
        F.col(xml_col).contains("<sitemapindex"), F.lit("index")
    ).otherwise(F.lit("urlset"))
    locs = F.regexp_extract_all(
        F.col(xml_col), F.lit(r"<loc>\s*([^<]+?)\s*</loc>"), 1
    )
    return df.select(
        *carry, kind.alias("kind"), F.explode(locs).alias("url")
    )


def robots_rules(
    robots: DataFrame,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Parse robots.txt bodies into a (domain, agent, prefix, allow)
    rule table — the crawl-politeness half of web ingest, entirely in
    codegen (explode + two windows, no UDFs).

    Grammar subset (stated honestly): ``User-agent`` / ``Allow`` /
    ``Disallow`` fields, ``#`` comments, case-insensitive field names;
    consecutive User-agent lines share the rule block that follows
    (the RFC 9309 record rule); line endings may be LF or CRLF (real
    robots.txt is overwhelmingly CRLF — a bare-'\\n' split left '\\r'
    on every value and silently failed every rule OPEN; ADVICE r13).
    ``*`` and ``$`` wildcards in path patterns are carried through
    verbatim here and interpreted by ``robots_filter`` (RFC 9309
    §2.2.3 — '*' matches any character run, a trailing '$' anchors
    end-of-path). Empty Disallow ("allow all") parses to a rule with
    an empty prefix and allow=true.

    Plan: one explode over lines; group ids from a running sum of
    new-User-agent markers (a UA line whose previous field line is not
    UA); agents collect per group and rules join to every agent of
    their group — two windows over (domain, pos), one self-join,
    rule-table sized."""
    grouped, agents = _robots_groups(robots, domain_col, text_col)
    rules = grouped.filter(
        F.col("field").isin("allow", "disallow")
    ).select(
        "domain",
        "grp",
        "pos",
        (
            (F.col("field") == "allow") | (F.col("value") == "")
        ).alias("allow"),
        F.col("value").alias("prefix"),
    )
    return rules.join(agents, ["domain", "grp"]).select(
        "domain", "agent", "prefix", "allow", "pos"
    )


def _robots_groups(robots, domain_col: str, text_col: str):
    """Shared robots.txt parse: comment-stripped field lines with the
    RFC 9309 group id (running sum of new-UA markers) and the
    per-group agent table. Group-scoped fields are user-agent /
    allow / disallow / crawl-delay; sitemap lines ride along (grp
    value irrelevant — sitemap is domain-scoped per the sitemaps
    protocol)."""
    from pyspark.sql import Window

    lines = robots.select(
        # hostnames are case-insensitive; normalize here so the filter
        # join (which lowercases the URL host) can never miss
        F.lower(F.col(domain_col)).alias("domain"),
        F.posexplode(
            F.split(F.col(text_col), "\r?\n")
        ).alias("pos", "raw"),
    ).select(
        "domain",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    fields = lines.filter(F.col("line") != "").select(
        "domain",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", "^([^:]+):", 1))).alias(
            "field"
        ),
        F.trim(F.regexp_extract("line", "^[^:]+:(.*)$", 1)).alias("value"),
    ).filter(
        F.col("field").isin(
            "user-agent", "allow", "disallow", "crawl-delay", "sitemap"
        )
    )
    w = Window.partitionBy("domain").orderBy("pos")
    grouped = fields.withColumn(
        "new_group",
        (
            (F.col("field") == "user-agent")
            & (
                F.coalesce(F.lag("field").over(w), F.lit(""))
                != "user-agent"
            )
        ).cast("int"),
    ).withColumn(
        "grp",
        F.sum("new_group").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    agents = (
        grouped.filter(F.col("field") == "user-agent")
        .select("domain", "grp", F.lower("value").alias("agent"))
        .distinct()
    )
    return grouped, agents


def robots_directives(
    robots: DataFrame,
    agent: str = "*",
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """Per-domain non-rule directives (NEW r14): ``crawl_delay`` for
    ``agent`` (group-scoped de-facto standard; the agent's own group
    wins, ``*`` is the fallback per the robots_filter §2.2.1
    discipline; multiple values take the MIN — the conservative
    politeness read) and ``sitemaps`` (domain-scoped per the sitemaps
    protocol; sorted, comma-joined — a STRING so value gates compare
    it engine-exactly). One row per domain that declares either;
    NULL crawl_delay / empty sitemaps where only the other appears.

    Plan: reuses the shared grouped-field parse (explode + two
    windows), then two rule-table-sized aggregations and one outer
    join — everything bounded by robots.txt sizes, never URLs."""
    grouped, agents = _robots_groups(robots, domain_col, text_col)
    delays = (
        grouped.filter(F.col("field") == "crawl-delay")
        .join(agents, ["domain", "grp"])
        .select(
            "domain",
            "agent",
            # try_cast: malformed delays (e.g. 'soon') drop as NULL
            # instead of failing the job under ANSI mode
            F.col("value").try_cast("double").alias("d"),
        )
        .filter(F.col("d").isNotNull())
    )
    own = delays.filter(F.col("agent") == agent.lower())
    if agent != "*":
        star = delays.filter(F.col("agent") == "*").join(
            own.select("domain").distinct(), "domain", "left_anti"
        )
        own = own.unionByName(star)
    delay = own.groupBy("domain").agg(F.min("d").alias("crawl_delay"))
    maps = (
        grouped.filter(
            (F.col("field") == "sitemap") & (F.col("value") != "")
        )
        .groupBy("domain")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("value")), ","
            ).alias("sitemaps")
        )
    )
    return (
        delay.join(maps, "domain", "full")
        .select(
            "domain",
            "crawl_delay",
            F.coalesce(F.col("sitemaps"), F.lit("")).alias("sitemaps"),
        )
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Apply a robots rule table to URLs with longest-match semantics
    (RFC 9309 / Google spec: the most specific matching rule — most
    pattern octets — wins; at equal length Allow beats Disallow; no
    matching rule means allowed). Per RFC 9309 §2.2.1, a named agent
    obeys its own group where the domain defines one and FALLS BACK
    to the ``*`` group otherwise (first cut ignored ``*`` for named
    agents — default-allowing nearly every real domain; caught in
    review).

    Wildcards (RFC 9309 §2.2.3, NEW r14 — previously a stated
    boundary that failed OPEN for the common ``Disallow: /*.pdf$``
    shape): ``*`` in a pattern matches any character run and a
    TRAILING ``$`` anchors end-of-path (a ``$`` anywhere else is
    literal, per the Google reference parser). Patterns compile to
    RE2-safe regexes entirely in codegen — escape regex
    metacharacters, strip a trailing ``$`` into an anchor, substitute
    ``\\*`` -> ``.*`` — and only wildcard-bearing rules take the
    ``regexp_like`` path; plain prefixes keep the cheaper
    ``startswith``. Precedence uses the PATTERN length (the RFC's
    octet count of the rule path), identical for both kinds.

    The rule table joins on domain — rules are domain-count sized, so
    the join is broadcast- or shuffle-hash eligible; the verdict is
    one max_by aggregation per distinct URL, no window. The verdict
    table is then joined back to the input frame, so the output is
    ROW-PRESERVING: duplicate input URLs yield duplicate output rows
    (ADVICE r13 — a filter-shaped API must not change cardinality);
    the join-back reuses the aggregation's url partitioning, so it
    costs one shuffle of the input, not two."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    path = F.regexp_extract(F.col(url_col), _PATH_RE, 1)
    u = urls.select(
        F.col(url_col).alias("url"),
        host.alias("domain"),
        F.when(path == "", "/").otherwise(path).alias("path"),
    )
    usable = rules.select(
        "domain", F.lower("agent").alias("agent"), "prefix", "allow"
    )
    specific = usable.filter(F.col("agent") == agent.lower())
    if agent != "*":
        star_fallback = usable.filter(F.col("agent") == "*").join(
            specific.select("domain").distinct(),
            "domain",
            "left_anti",
        )
        specific = specific.unionByName(star_fallback)
    # compile RFC 9309 wildcards once, on the rule table (small side):
    # trailing '$' -> end anchor; remaining metachars escaped; '*' -> .*
    anchored = F.col("prefix").endswith("$")
    base = F.when(
        anchored, F.expr("substring(prefix, 1, length(prefix) - 1)")
    ).otherwise(F.col("prefix"))
    esc = F.regexp_replace(
        base, r"([\\.\^\$\+\?\(\)\[\]\{\}\|])", r"\\$1"
    )
    pattern = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    r = specific.select(
        "domain",
        "prefix",
        "allow",
        F.col("prefix").rlike(r"[*$]").alias("is_wild"),
        pattern.alias("pattern"),
    )
    joined = u.join(r, "domain", "left").withColumn(
        "matches",
        F.col("prefix").isNotNull()
        & F.when(
            F.col("is_wild"),
            F.regexp_like(F.col("path"), F.col("pattern")),
        ).otherwise(F.col("path").startswith(F.col("prefix"))),
    )
    # verdict key: (pattern length, allow) — longest wins, allow
    # breaks ties; non-matching rows contribute (-1, true) = allow
    verdict = joined.groupBy("url", "domain", "path").agg(
        F.max_by(
            F.col("matches") & ~F.col("allow"),
            F.when(
                F.col("matches"),
                F.length("prefix") * 2 + F.col("allow").cast("int"),
            ).otherwise(F.lit(-1)),
        ).alias("blocked")
    ).select(
        "url",
        "domain",
        "path",
        (~F.coalesce(F.col("blocked"), F.lit(False))).alias("allowed"),
    )
    return u.join(verdict, ["url", "domain", "path"], "left")
