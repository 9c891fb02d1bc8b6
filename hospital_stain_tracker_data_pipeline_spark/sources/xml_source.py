"""XML source (Spark 4's built-in ``xml`` format) + the two web-crawl
XML shapes a corpus pipeline actually meets: sitemaps (the standard
crawl-frontier seed, sitemaps.org protocol) and sitemap INDEX files
(the sharding layer above them).

Same schema-on-read discipline as the CSV/JSONL sources (SURVEY.md
§2.1/§2.2): an EXPLICIT schema — never inference, which would scan the
input twice and silently widen types — with unparseable rows routed to
a ``_corrupt_record`` side-channel instead of failing the batch.
Gzipped inputs (``sitemap.xml.gz`` is the protocol's own convention)
decompress transparently through the file-source codec path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_record"

# sitemaps.org <urlset>: one <url> entry per page. Only <loc> is
# required by the protocol; the optional fields stay NULL when absent.
SITEMAP_SCHEMA = T.StructType(
    [
        T.StructField("loc", T.StringType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField(_CORRUPT, T.StringType(), True),
    ]
)

# sitemaps.org <sitemapindex>: one <sitemap> entry per child sitemap.
SITEMAP_INDEX_SCHEMA = T.StructType(
    [
        T.StructField("loc", T.StringType(), True),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField(_CORRUPT, T.StringType(), True),
    ]
)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: T.StructType,
) -> DataFrame:
    """Read XML with an explicit row tag and schema; rows that fail to
    parse land whole in ``_corrupt_record`` (PERMISSIVE mode) when the
    schema declares that column, so one mangled record never kills a
    corpus-scale batch. The built-in source splits by element
    boundary, so a directory of files parallelizes like any other
    file source; per-file gzip is handled by the codec layer."""
    return (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .schema(schema)
        .load(path)
    )


def read_sitemap(spark: SparkSession, path: str) -> DataFrame:
    """A sitemap (or a directory/glob of them, plain or ``.xml.gz``)
    as ``(url, lastmod, changefreq, priority)`` — the crawl-frontier
    seed table: feed ``url`` straight into
    ``operators.web.canonicalize_url``/``dedup_exact_urls`` and join
    ``lastmod`` against the lake's fetch dates to pick what to
    re-crawl. Entries without a ``<loc>`` (protocol violation) and
    unparseable ``<url>`` blocks are dropped — a frontier row without
    a URL seeds nothing; ``lastmod`` stays a raw string (sitemaps mix
    date-only and full W3C datetime forms; parse with ``try_to_date``
    downstream where the precision matters)."""
    raw = read_xml(spark, path, row_tag="url", schema=SITEMAP_SCHEMA)
    return (
        raw.filter(F.col("loc").isNotNull())
        .select(
            F.col("loc").alias("url"),
            "lastmod",
            "changefreq",
            "priority",
        )
    )


def read_sitemap_index(spark: SparkSession, path: str) -> DataFrame:
    """A sitemap index as ``(sitemap_url, lastmod)`` — resolve these,
    fetch the child sitemaps, and ``read_sitemap`` the results. Kept
    as a separate reader (not auto-recursed): fetching is the caller's
    I/O policy, this layer only parses."""
    raw = read_xml(
        spark, path, row_tag="sitemap", schema=SITEMAP_INDEX_SCHEMA
    )
    return raw.filter(F.col("loc").isNotNull()).select(
        F.col("loc").alias("sitemap_url"), "lastmod"
    )
