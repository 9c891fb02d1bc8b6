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
