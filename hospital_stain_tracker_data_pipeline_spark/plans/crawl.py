"""Driver-graded crawl-scheduling plan (round-11 catalog rotation).

The crawl family (canonicalize/dedup → plan_recrawl → robots gate →
schedule) had zero driver-graded entries through round 10 — everything
was pytest-pinned under the 50-entry cap. This module promotes the
politeness-scheduling composition: ``schedule_fetch`` wave assignment
over a synthetic frontier routed across 40 domains, ``robots_crawl_delays``
parsing REAL robots.txt bodies (the production group walker, not a
stub), and ``fetch_timeline`` composing both into per-URL earliest-start
offsets. The DuckDB oracle re-derives the domain arithmetically from the
synthetic URL shape (the Spark side runs the real regex extractor — the
comparison cross-checks it) and replays the window + the delay
coalesce exactly.

Determinism: the frontier is a pure function of doc_id; wave ordering is
(priority DESC, url ASC) — total because urls are unique; Crawl-delay
values are small integers, exact in doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.web import (
    fetch_timeline,
    robots_crawl_delays,
    schedule_fetch,
)
from ..sources.tables import load_fixture_table


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness timeline for a 40-domain frontier: one URL per
    document, waves capped at 2 URLs per domain per round
    (`operators/web.py::schedule_fetch` — one window exchange on
    domain), Crawl-delay parsed from real robots.txt bodies for the
    even-numbered domains (`robots_crawl_delays` — the RFC 9309 group
    walker), odd domains pacing by the 1.5 s default
    (`fetch_timeline` — one broadcast join, pure Columns)."""
    docs = load_fixture_table(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(
            F.lit("https://crawl"),
            (F.col("doc_id") % 40).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.col("doc_id") % 9).cast("double").alias("priority"),
    )
    robots = spark.range(40).select(
        F.concat(F.lit("crawl"), F.col("id"), F.lit(".example")).alias(
            "domain"
        ),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("User-agent: *\nCrawl-delay: "),
                (F.col("id") % 7 + 1).cast("string"),
                F.lit("\nDisallow: /private/\n"),
            ),
        )
        .otherwise(F.lit("User-agent: *\nDisallow: /tmp/\n"))
        .alias("robots_txt"),
    )
    return fetch_timeline(
        schedule_fetch(frontier, per_domain_per_wave=2, priority_col="priority"),
        robots_crawl_delays(robots),
        default_delay_s=1.5,
    )


SQL_FETCH_SCHEDULE = r"""
WITH f AS (
  SELECT 'https://crawl' || CAST(doc_id % 40 AS VARCHAR)
           || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
         CAST(doc_id % 9 AS DOUBLE) AS priority,
         'crawl' || CAST(doc_id % 40 AS VARCHAR) || '.example' AS domain,
         doc_id % 40 AS dnum
  FROM documents
), w AS (
  SELECT url, priority, domain, dnum,
         CAST(floor((row_number() OVER (PARTITION BY domain
           ORDER BY priority DESC, url ASC) - 1) / 2) AS INT) AS wave
  FROM f
), d AS (
  SELECT dnum, CAST(dnum % 7 + 1 AS DOUBLE) AS delay
  FROM (SELECT unnest(range(0, 40, 2)) AS dnum)
)
SELECT url, priority, domain, wave,
       coalesce(delay, 1.5) AS crawl_delay_s,
       wave * coalesce(delay, 1.5) AS earliest_fetch_offset_s
FROM w LEFT JOIN d USING (dnum)
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-URL crawl dedup hash-graded (round-13 rotation): a
    synthetic re-crawl frontier — page id ``doc_id*2 div 3`` maps every
    3 consecutive docs onto 2 pages, under scheme-case / default-port /
    trailing-slash / tracking-param / param-order / fragment noise —
    goes through the REAL canonicalizer (`operators/web.py::
    canonicalize_url`, pure Column expressions) and the lowest-id
    winner selection (`dedup_exact_urls` — the groupBy shuffles only
    (canon, id), never the payload).

    The returned frame carries the CANONICAL string alongside each
    surviving raw URL, so the DuckDB oracle (which re-derives both
    arithmetically from doc_id) value-grades the canonicalization
    output itself — wrong port-stripping, param sorting, or slash
    collapsing hash-mismatches, not just wrong winner counts."""
    from ..operators.web import canonicalize_url, dedup_exact_urls

    docs = load_fixture_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("https://www.example.com:443/p/"),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.lit("HTTPS://WWW.Example.COM/p/"),
            )
            .otherwise(F.lit("https://www.example.com/p/")),
            F.expr("doc_id * 2 div 3").cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("/?utm_source=feed&b=2&a=1"),
            )
            .when(F.col("doc_id") % 3 == 1, F.lit("?b=2&a=1"))
            .otherwise(F.lit("?a=1&b=2#frag")),
        ).alias("url"),
    )
    return (
        dedup_exact_urls(urls)
        .withColumn("canon", canonicalize_url(F.col("url")))
        .orderBy("doc_id")
    )


SQL_URL_DEDUP = """
WITH u AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 4 = 0 THEN 'https://www.example.com:443/p/'
               WHEN doc_id % 4 = 1 THEN 'HTTPS://WWW.Example.COM/p/'
               ELSE 'https://www.example.com/p/' END)
         || CAST(doc_id * 2 // 3 AS VARCHAR)
         || (CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&b=2&a=1'
                  WHEN doc_id % 3 = 1 THEN '?b=2&a=1'
                  ELSE '?a=1&b=2#frag' END) AS url,
         doc_id * 2 // 3 AS pid
  FROM documents
), w AS (
  SELECT pid, MIN(doc_id) AS doc_id FROM u GROUP BY pid
)
SELECT u.doc_id, u.url,
       'https://www.example.com/p/' || CAST(u.pid AS VARCHAR)
         || '?a=1&b=2' AS canon
FROM u JOIN w ON u.doc_id = w.doc_id
ORDER BY u.doc_id
"""


def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots gate hash-graded (round-13 rotation, second
    crawl promotion): 50 synthetic domains publish REAL robots.txt
    bodies — even domains a two-group file (an `examplebot` group plus
    a `*` group with wildcard, `$`-anchored, and query-matching rules),
    odd domains a star-only file — and a frontier of one URL per
    document (8 path shapes hitting every rule class, including a
    longest-match conflict `/pub/x.php` where `Disallow /*.php` (6)
    must beat `Allow /pub/` (5)) runs the REAL parser + matcher
    (`operators/web.py::robots_rules` group walker → `robots_filter`
    broadcast join + cached-regex match + struct-max argmax) under TWO
    product tokens: `examplebot` (selects the specific group where
    defined) and `otherbot` (falls back to `*` everywhere) — group
    selection itself is part of the graded value.

    The DuckDB oracle re-states the authored rule tables as VALUES
    (the same anchored regexes `_robots_pattern_regex` emits) and
    replays longest-match with the exact tie order (pattern octet
    length desc, allow desc, pattern desc), so a parser or matcher
    drift hash-mismatches."""
    from ..operators.web import robots_filter, robots_rules

    bot_body = (
        "User-agent: examplebot\nDisallow: /private/\n"
        "Allow: /private/ok/\n\n"
        "User-agent: *\nDisallow: /*.php\nAllow: /pub/\n"
        "Disallow: /tmp/$\nDisallow: /search?\n"
    )
    star_body = (
        "User-agent: *\nDisallow: /admin/\nAllow: /\n"
        "Disallow: /*.cgi\nDisallow: /old/*archive$\n"
    )
    robots = spark.range(50).select(
        F.concat(F.lit("crawl"), F.col("id"), F.lit(".example")).alias(
            "domain"
        ),
        F.when(F.col("id") % 2 == 0, F.lit(bot_body))
        .otherwise(F.lit(star_body))
        .alias("robots_txt"),
    )
    rules = robots_rules(robots)

    docs = load_fixture_table(spark, sf_dir, "documents")
    c = F.col("doc_id") % 8
    sid = F.col("doc_id").cast("string")
    path = (
        F.when(c == 0, F.concat(F.lit("/private/ok/a"), sid))
        .when(c == 1, F.concat(F.lit("/private/a"), sid))
        .when(c == 2, F.concat(F.lit("/a"), sid, F.lit(".php")))
        .when(c == 3, F.concat(F.lit("/pub/a"), sid, F.lit(".php")))
        .when(c == 4, F.lit("/tmp/"))
        .when(c == 5, F.concat(F.lit("/search?q=a"), sid))
        .when(c == 6, F.concat(F.lit("/admin/a"), sid))
        .otherwise(F.concat(F.lit("/old/a"), sid, F.lit("archive")))
    )
    frontier = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://crawl"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".example"),
            path,
        ).alias("url"),
    )
    parts = [
        robots_filter(frontier, rules, user_agent=ua).withColumn(
            "agent", F.lit(ua)
        )
        for ua in ("examplebot", "otherbot")
    ]
    return (
        parts[0]
        .unionByName(parts[1])
        .select("doc_id", "agent", "url", "robots_allowed", "robots_rule")
        .orderBy("doc_id", "agent")
    )


SQL_ROBOTS_GATE = r"""
WITH u AS (
  SELECT doc_id,
         'https://crawl' || CAST(doc_id % 50 AS VARCHAR) || '.example'
           || p.path AS url,
         (doc_id % 50) % 2 AS dpar, p.path
  FROM (
    SELECT doc_id,
           CASE doc_id % 8
             WHEN 0 THEN '/private/ok/a' || CAST(doc_id AS VARCHAR)
             WHEN 1 THEN '/private/a' || CAST(doc_id AS VARCHAR)
             WHEN 2 THEN '/a' || CAST(doc_id AS VARCHAR) || '.php'
             WHEN 3 THEN '/pub/a' || CAST(doc_id AS VARCHAR) || '.php'
             WHEN 4 THEN '/tmp/'
             WHEN 5 THEN '/search?q=a' || CAST(doc_id AS VARCHAR)
             WHEN 6 THEN '/admin/a' || CAST(doc_id AS VARCHAR)
             ELSE '/old/a' || CAST(doc_id AS VARCHAR) || 'archive'
           END AS path
    FROM documents
  ) p
), agents(agent) AS (SELECT 'examplebot' UNION ALL SELECT 'otherbot'),
rules(dpar, agent, allow, pattern, plen, rx) AS (VALUES
  (0, 'examplebot', FALSE, '/private/',      9, '^/private/'),
  (0, 'examplebot', TRUE,  '/private/ok/',  12, '^/private/ok/'),
  (0, 'otherbot',   FALSE, '/*.php',         6, '^/.*\.php'),
  (0, 'otherbot',   TRUE,  '/pub/',          5, '^/pub/'),
  (0, 'otherbot',   FALSE, '/tmp/$',         6, '^/tmp/$'),
  (0, 'otherbot',   FALSE, '/search?',       8, '^/search\?'),
  (1, 'examplebot', FALSE, '/admin/',        7, '^/admin/'),
  (1, 'examplebot', TRUE,  '/',              1, '^/'),
  (1, 'examplebot', FALSE, '/*.cgi',         6, '^/.*\.cgi'),
  (1, 'examplebot', FALSE, '/old/*archive$',14, '^/old/.*archive$'),
  (1, 'otherbot',   FALSE, '/admin/',        7, '^/admin/'),
  (1, 'otherbot',   TRUE,  '/',              1, '^/'),
  (1, 'otherbot',   FALSE, '/*.cgi',         6, '^/.*\.cgi'),
  (1, 'otherbot',   FALSE, '/old/*archive$',14, '^/old/.*archive$')
), cand AS (
  SELECT u.doc_id, a.agent, u.url, r.allow, r.pattern,
         ROW_NUMBER() OVER (
           PARTITION BY u.doc_id, a.agent
           ORDER BY r.plen DESC, r.allow DESC, r.pattern DESC
         ) AS rn
  FROM u CROSS JOIN agents a
  JOIN rules r ON r.dpar = u.dpar AND r.agent = a.agent
              AND regexp_matches(u.path, r.rx)
)
SELECT u.doc_id, a.agent, u.url,
       COALESCE(w.allow, TRUE) AS robots_allowed,
       CASE WHEN w.pattern IS NOT NULL THEN
         (CASE WHEN w.allow THEN 'allow:' ELSE 'disallow:' END)
           || w.pattern
       END AS robots_rule
FROM u CROSS JOIN agents a
LEFT JOIN (SELECT doc_id, agent, allow, pattern FROM cand WHERE rn = 1) w
  ON w.doc_id = u.doc_id AND w.agent = a.agent
ORDER BY u.doc_id, a.agent
"""
