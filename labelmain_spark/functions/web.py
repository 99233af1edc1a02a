"""URL / domain extraction + per-domain corpus stats (SURVEY.md §2.11
north-star: the C4 / RefinedWeb-style per-domain accounting every web
corpus runs — which domains dominate the corpus, how long their docs
are — driving domain-level filtering and mixing weights).

Shape at 100 TB: URL extraction is a narrow JVM-side regexp map stage;
the per-domain rollup is one partial-agg shuffle keyed by domain.
Domain keys are Zipf-skewed on real crawls (a wikipedia.org key can be
1e9 rows), but both aggregates here (count, sum) are algebraic, so
map-side partial aggregation collapses each domain to one row per
upstream partition before the exchange — the hot key receives
O(partitions) partial rows, never the raw postings.

Fixture note: the synthetic corpus contains no URLs, so the query
INJECTS deterministic URLs keyed by ``doc_id`` with the identical
expression in Spark and DuckDB (same pattern as functions/pii.py),
yielding docs with 0, 1 or 2 URLs and a Zipf-ish domain histogram via
the mod-7 site index. Regexes restricted to the Java/RE2 common
dialect (no lookaround, no backreferences).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9/._-]*)?"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _augmented() -> Column:
    """text + deterministic URL spans keyed by doc_id (SQL twin below)."""
    sid = F.col("doc_id").cast("string")
    site = (F.col("doc_id") % 7).cast("string")
    mirror = (F.col("doc_id") % 3).cast("string")
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" see https://site"), site, F.lit(".example.com/p/"), sid
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" via http://m"), mirror, F.lit(".example.org/idx"),
            ),
        ).otherwise(F.lit("")),
    )


_SQL_AUG = """
    text
    || CASE WHEN doc_id % 2 = 0
            THEN ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com/p/' || CAST(doc_id AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' via http://m' || CAST(doc_id % 3 AS VARCHAR)
                 || '.example.org/idx'
            ELSE '' END
"""


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rollup: URL mentions, distinct docs, total doc chars.

    explode(regexp_extract_all) → one row per URL mention → domain via
    a single capture group → algebraic rollup. ``n_docs`` is a distinct
    count, which Spark runs as the standard two-phase expand (partial
    per (domain, doc_id), then final per domain) — still skew-safe
    because a domain's distinct docs are bounded by its postings."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.regexp_extract_all(_augmented(), F.lit(URL_RE), 0)).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            "n_chars",
            F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# Deterministic stand-in for the UT1 / C4-style domain blocklist
# (the public "Université Toulouse 1" list both C4 and RefinedWeb
# filter against). Suffix semantics: an entry blocks the exact host
# AND every subdomain of it — `example.org` blocks m0.example.org.
BLOCKLIST = ["site3.example.com", "site5.example.com", "example.org"]


def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist document filter — the C4 / RefinedWeb URL
    filtering stage: a document is dropped when ANY host it links to
    matches a blocklist entry under registrable-domain suffix rules
    (entry blocks itself and all subdomains). Output per document:
    distinct hosts mentioned, the matched blocklist entry (min across
    matches, NULL when clean), and the keep verdict.

    Scale shape: the ENTIRE plan is one narrow JVM map over the
    corpus — URL extraction, host parse, per-host suffix-chain
    expansion (bounded by DNS label count, ≤ ~10), and blocklist
    membership all run inside array expressions on the row; zero
    shuffles, zero joins, zero Python. The demo list rides as a
    literal array; a production UT1-class list (~3M entries) swaps
    ``array_intersect(suffixes, lit)`` for a LEFT SEMI broadcast join
    of the exploded suffix chain against the broadcast blocklist
    table — same bounded-small-side class as the dedup family's
    benchmark shingles, and the per-doc verdict re-aggregates
    map-side. Either way the corpus never shuffles to be classified.

    The classifier body lives in :func:`blocklist_docs` — shared
    VERBATIM with the streaming ingest twin
    (streaming/incremental.py::run_blocklist_sink), the r7 verdict's
    tag_and_filter discipline: row-local, no cross-batch state, so
    stream parity holds by construction."""
    docs = load_table(spark, sf_dir, "documents")
    return blocklist_docs(docs)


def blocklist_docs(docs: DataFrame) -> DataFrame:
    """The blocklist classifier over (doc_id, text) — see
    :func:`blocklist_filter` for semantics and scale argument."""
    hosts = F.transform(
        F.regexp_extract_all(_augmented(), F.lit(URL_RE), 0),
        lambda u: F.regexp_extract(u, DOMAIN_RE, 1),
    )
    base = docs.select("doc_id", hosts.alias("hosts"))
    # per-host suffix chain: "m0.example.org" -> [itself, example.org,
    # org]; min matched entry across all hosts, NULL when clean
    out = base.selectExpr(
        "doc_id",
        "CAST(size(array_distinct(hosts)) AS INT) AS n_hosts",
        "array_min(flatten(transform(hosts, h -> array_intersect("
        "transform(sequence(1, size(split(h, '[.]'))), "
        "i -> array_join(slice(split(h, '[.]'), i, "
        "size(split(h, '[.]')) - i + 1), '.')), "
        + "array(" + ", ".join(f"'{b}'" for b in BLOCKLIST) + "))))) AS blocked_domain",
    )
    return out.select(
        "doc_id",
        "n_hosts",
        "blocked_domain",
        F.col("blocked_domain").isNull().alias("kept"),
    )


def domain_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level link-graph PageRank — the CommonCrawl
    host/domain-rank artifact (used for crawl prioritization and as a
    quality prior in corpus recipes): publisher → mentioned-host
    edges from the corpus's own link extraction, ranked by the shared
    :func:`integer_pagerank` core. Composition, not new machinery:
    the web family's zero-shuffle URL extraction builds the edge
    frame; the graph family's verified integer loop (exact 1e-9-unit
    longs, fixed iterations, bit-exact unrolled-CTE oracle) does the
    ranking over STRING nodes — the same code path the event graph
    exercises with long nodes.

    Scale: edge construction is one narrow map + distinct (the edge
    set is bounded by distinct (publisher, host) pairs, ≪ mentions);
    the loop's per-iteration cost is the pagerank argument."""
    from labelmain_spark.functions.graph import integer_pagerank

    docs = load_table(spark, sf_dir, "documents")
    hosts = F.transform(
        F.regexp_extract_all(_augmented(), F.lit(URL_RE), 0),
        lambda u: F.regexp_extract(u, DOMAIN_RE, 1),
    )
    e = (
        docs.select(F.col("source").alias("src"), F.explode(hosts).alias("dst"))
        .filter(F.col("dst") != "")
        .distinct()
    )
    return integer_pagerank(spark, e)


_DOMAIN_EDGE_SQL = f"""
            SELECT DISTINCT source AS src, dst FROM (
                SELECT source,
                       unnest(list_transform(
                           regexp_extract_all({_SQL_AUG}, '{URL_RE}'),
                           u -> regexp_extract(u, '{DOMAIN_RE}', 1)
                       )) AS dst
                FROM documents
            ) WHERE dst <> ''
"""


def _cast_str(x: str, engine: str) -> str:
    return f"CAST({x} AS STRING)" if engine == "spark" else f"CAST({x} AS VARCHAR)"


def _raw_urls(engine: str) -> list[str]:
    """Three deterministic raw-URL variants keyed by doc_id (the
    fixture has no URL column — same injection pattern as
    ``_augmented``): v1 and v2 are MESSY spellings of the SAME
    canonical URL (case-shuffled scheme/host, default port, tracking
    params, fragment, trailing slash); v3 keeps a NON-default port
    that canonicalization must preserve. NULL when the variant does
    not apply to this doc."""
    k = _cast_str("doc_id % 7", engine)
    m = _cast_str("doc_id % 20", engine)
    j = _cast_str("doc_id % 5", engine)
    r = _cast_str("doc_id % 3", engine)
    v1 = (
        f"'HTTPS://Site' || {k} || '.Example.COM:443/Art/' || {m}"
        f" || '/?utm_source=feed&id=' || {j} || '#frag'"
    )
    v2 = (
        f"CASE WHEN doc_id % 3 = 0 THEN "
        f"'https://site' || {k} || '.example.com/Art/' || {m}"
        f" || '?id=' || {j} || '&utm_campaign=news' END"
    )
    v3 = (
        f"CASE WHEN doc_id % 5 = 0 THEN "
        f"'http://M' || {r} || '.Example.ORG:8080/idx' END"
    )
    return [v1, v2, v3]


# Canonicalization stages — ONE SQL text shared verbatim by both
# engines (regexp_extract/regexp_replace/lower/substr have identical
# signatures; patterns avoid backslash escapes entirely — '[?]'
# instead of '\?' — so Spark's string-literal escaping cannot diverge
# from DuckDB's).
_C_STRIP_FRAG = "regexp_replace(u, '#.*$', '')"
_C_PARTS = {
    "scheme": "lower(regexp_extract(c0, '^([A-Za-z]+)://', 1))",
    "host": "lower(regexp_extract(c0, '^[A-Za-z]+://([A-Za-z0-9.-]+)', 1))",
    "port": "regexp_extract(c0, '^[A-Za-z]+://[A-Za-z0-9.-]+:([0-9]+)', 1)",
    "rest": "regexp_extract(c0, '^[A-Za-z]+://[A-Za-z0-9.-]+(:[0-9]+)?(.*)$', 2)",
}
_C_PATH = "regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '')"
_C_QUERY = "regexp_extract(rest, '[?](.*)$', 1)"
_C_CLEANQ = (
    "substr(regexp_replace('&' || q, "
    "'&(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&]*', ''), 2)"
)
_C_ASSEMBLE = (
    "scheme || '://' || host"
    " || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')"
    "          OR (scheme = 'https' AND port = '443')"
    "     THEN '' ELSE ':' || port END"
    " || path"
    " || CASE WHEN cq = '' THEN '' ELSE '?' || cq END"
)


def _canonicalize(df: DataFrame, keep: list[str]) -> DataFrame:
    """Apply the shared canonicalization stage chain to a frame with a
    raw-URL column ``u``, carrying ``keep`` columns through; appends
    ``canon``. Pure JVM regexp map stages — zero shuffles."""
    return (
        df.selectExpr(*keep, f"{_C_STRIP_FRAG} AS c0")
        .selectExpr(*keep, *[f"{v} AS {k}" for k, v in _C_PARTS.items()])
        .selectExpr(
            *keep, "scheme", "host", "port",
            f"{_C_PATH} AS path", f"{_C_QUERY} AS q",
        )
        .selectExpr(*keep, "scheme", "host", "port", "path", f"{_C_CLEANQ} AS cq")
        .selectExpr(*keep, f"{_C_ASSEMBLE} AS canon")
    )


def url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-URL dedup — the CommonCrawl /
    C4 frontier step that collapses spelling variants of one page
    BEFORE any fetch or text dedup: lowercase scheme+host, strip
    fragments, drop default ports (keep real ones), strip trailing
    path slashes, and remove tracking parameters (utm_*, fbclid,
    gclid) while preserving every other query param in order.

    Output per canonical URL: n_mentions (raw occurrences) and
    n_variants (distinct raw spellings) — n_variants > 1 IS the dedup
    win, pinned by the fixture's v1/v2 pair collapsing to one key.

    Scale shape: the whole canonicalizer is a chain of JVM-side
    regexp map stages (zero shuffles, zero Python); the rollup is one
    partial-agg exchange keyed by canonical URL. Canonical-URL keys
    are Zipf-skewed on real crawls, but both aggregates are algebraic
    — the hot page collapses map-side (the domain_stats argument).
    Every stage is the same SQL text in both engines, so parity is by
    construction, not by reimplementation."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raw = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.expr(v) for v in _raw_urls("spark")])
        ).alias("u"),
    ).filter(F.col("u").isNotNull())
    c = _canonicalize(raw, ["u"])
    return c.groupBy(F.col("canon").alias("canonical_url")).agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("u").cast("long").alias("n_variants"),
    )


# Each document's single "source page URL" for URL-level dedup — one
# of two MESSY spellings (keyed by doc_id parity) of the canonical URL
# shared by every doc with the same (site, article, id) index triple,
# so canonical groups span spelling variants by construction.
def _page_url(engine: str) -> str:
    k = _cast_str("doc_id % 7", engine)
    m = _cast_str("doc_id % 20", engine)
    j = _cast_str("doc_id % 5", engine)
    return (
        f"CASE WHEN doc_id % 2 = 0 THEN "
        f"'HTTPS://Site' || {k} || '.Example.COM:443/Art/' || {m}"
        f" || '/?utm_source=feed&id=' || {j} || '#frag'"
        f" ELSE 'https://site' || {k} || '.example.com/Art/' || {m}"
        f" || '?id=' || {j} || '&utm_campaign=news' END"
    )


def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level document dedup — the CCNet / CommonCrawl snapshot
    step that keeps ONE document per canonical page URL before any
    text-level dedup runs: canonicalize each doc's source URL (the
    url_canonical stage chain, shared verbatim), group by canonical
    URL, and keep the best-quality member (max n_chars, ties to min
    doc_id — the "longest capture wins" recrawl rule). Output per
    canonical URL: the surviving doc, its length, and the group size.

    Scale shape: canonicalization is the same zero-shuffle JVM regexp
    chain as url_canonical; survivor selection is ONE partial-agg
    shuffle keyed by canonical URL carrying a min(struct) — a page
    recrawled 10^4 times collapses map-side to one candidate row per
    upstream partition (the dedup_paragraph argument), so hot-URL
    skew never materializes as a fat reduce key."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    raw = docs.selectExpr("doc_id", "n_chars", f"{_page_url('spark')} AS u")
    c = _canonicalize(raw, ["doc_id", "n_chars"])
    best = c.groupBy(F.col("canon").alias("canonical_url")).agg(
        F.min(
            F.struct(
                (-F.col("n_chars")).alias("neg_chars"),
                F.col("doc_id").alias("doc_id"),
            )
        ).alias("w"),
        F.count(F.lit(1)).cast("long").alias("n_dupes"),
    )
    return best.select(
        "canonical_url",
        F.col("w.doc_id").alias("doc_id"),
        (-F.col("w.neg_chars")).cast("long").alias("n_chars"),
        "n_dupes",
    )


def _sql_url_canonical() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT doc_id, {v} AS u FROM documents" for v in _raw_urls("duck")
    )
    parts = ",\n".join(f"{v} AS {k}" for k, v in _C_PARTS.items())
    return f"""
        WITH raw AS (
            SELECT doc_id, u FROM ({unions}) WHERE u IS NOT NULL
        ),
        s0 AS (SELECT u, {_C_STRIP_FRAG} AS c0 FROM raw),
        s1 AS (SELECT u, {parts} FROM s0),
        s2 AS (SELECT u, scheme, host, port,
                      {_C_PATH} AS path, {_C_QUERY} AS q FROM s1),
        s3 AS (SELECT u, scheme, host, port, path, {_C_CLEANQ} AS cq FROM s2)
        SELECT {_C_ASSEMBLE} AS canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_mentions,
               CAST(COUNT(DISTINCT u) AS BIGINT) AS n_variants
        FROM s3
        GROUP BY 1
    """


QUERIES = {
    "domain_stats": domain_stats,
    "url_canonical": url_canonical,
    "blocklist_filter": blocklist_filter,
    "dedup_url": dedup_url,
    "domain_rank": domain_rank,
}


def _sql_domain_rank() -> str:
    from labelmain_spark.functions.graph import _pagerank_oracle

    return _pagerank_oracle(_DOMAIN_EDGE_SQL)


def _sql_dedup_url() -> str:
    parts = ",\n".join(f"{v} AS {k}" for k, v in _C_PARTS.items())
    keep = "doc_id, n_chars,"
    return f"""
        WITH raw AS (
            SELECT doc_id, n_chars, {_page_url("duck")} AS u FROM documents
        ),
        s0 AS (SELECT {keep} {_C_STRIP_FRAG} AS c0 FROM raw),
        s1 AS (SELECT {keep} {parts} FROM s0),
        s2 AS (SELECT {keep} scheme, host, port,
                      {_C_PATH} AS path, {_C_QUERY} AS q FROM s1),
        s3 AS (SELECT {keep} scheme, host, port, path, {_C_CLEANQ} AS cq FROM s2),
        c AS (SELECT {keep} {_C_ASSEMBLE} AS canon FROM s3),
        sel AS (
            SELECT canon AS canonical_url, doc_id, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY canon ORDER BY n_chars DESC, doc_id
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY canon) AS n_dupes
            FROM c
        )
        SELECT canonical_url, doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_dupes AS BIGINT) AS n_dupes
        FROM sel WHERE rn = 1
    """

_SQL_BLOCKLIST = "[" + ", ".join(f"'{b}'" for b in BLOCKLIST) + "]"

ORACLE = {
    "url_canonical": _sql_url_canonical(),
    # the graph family's unrolled-CTE integer-PageRank oracle over the
    # domain edge CTE — bit-exact, same parameterization as the Spark
    # side's shared integer_pagerank core
    "domain_rank": _sql_domain_rank(),
    # identical stage chain; survivor via ROW_NUMBER (independent path
    # to the same min-struct winner)
    "dedup_url": _sql_dedup_url(),
    # identical suffix-chain + list-intersect expression shape
    "blocklist_filter": f"""
        WITH h AS (
            SELECT doc_id,
                   list_transform(
                       regexp_extract_all({_SQL_AUG}, '{URL_RE}'),
                       u -> regexp_extract(u, '{DOMAIN_RE}', 1)
                   ) AS hosts
            FROM documents
        ), m AS (
            SELECT doc_id,
                   CAST(len(list_distinct(hosts)) AS INTEGER) AS n_hosts,
                   list_min(flatten(list_transform(hosts,
                       h -> list_intersect(
                           list_transform(
                               range(1, len(string_split(h, '.')) + 1),
                               i -> array_to_string(list_slice(
                                   string_split(h, '.'), i,
                                   len(string_split(h, '.'))), '.')
                           ),
                           {_SQL_BLOCKLIST}
                       )
                   ))) AS blocked_domain
            FROM h
        )
        SELECT doc_id, n_hosts, blocked_domain,
               blocked_domain IS NULL AS kept
        FROM m
    """,
    "domain_stats": f"""
        WITH urls AS (
            SELECT doc_id, n_chars,
                   unnest(regexp_extract_all({_SQL_AUG}, '{URL_RE}')) AS url
            FROM documents
        )
        SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM urls GROUP BY 1
    """,
}
