"""XML source + sitemap/sitemap-index readers: explicit-schema parse,
corrupt-record side-channel, gzip transparency, loc-required protocol
rule, and the frontier composition into canonicalize_url."""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from hospital_stain_tracker_data_pipeline_spark.sources.xml_source import (
    read_sitemap,
    read_sitemap_index,
    read_xml,
    SITEMAP_SCHEMA,
)

SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://ex.com/a?utm_source=feed</loc>
    <lastmod>2026-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc>https://ex.com/b</loc>
    <lastmod>2026-02-01T10:00:00+00:00</lastmod>
  </url>
  <url>
    <lastmod>2026-03-01</lastmod>
  </url>
</urlset>
"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://ex.com/sitemap-1.xml.gz</loc>
  <lastmod>2026-01-01</lastmod></sitemap>
  <sitemap><loc>https://ex.com/sitemap-2.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_read_sitemap_plain_and_gzip(spark, tmp_path):
    """Entries parse with the optional fields NULL when absent, a
    loc-less entry (protocol violation) is dropped, and the standard
    sitemap.xml.gz form reads identically through the codec layer."""
    plain = str(tmp_path / "sitemap.xml")
    with open(plain, "w") as f:
        f.write(SITEMAP)
    rows = {
        r["url"]: (r["lastmod"], r["changefreq"], r["priority"])
        for r in read_sitemap(spark, plain).collect()
    }
    assert rows == {
        "https://ex.com/a?utm_source=feed": ("2026-01-05", "daily", 0.8),
        "https://ex.com/b": ("2026-02-01T10:00:00+00:00", None, None),
    }

    gz = str(tmp_path / "sitemap.xml.gz")
    with gzip.open(gz, "wt") as f:
        f.write(SITEMAP)
    rows_gz = {
        r["url"]: (r["lastmod"], r["changefreq"], r["priority"])
        for r in read_sitemap(spark, gz).collect()
    }
    assert rows_gz == rows


def test_read_sitemap_index(spark, tmp_path):
    p = str(tmp_path / "index.xml")
    with open(p, "w") as f:
        f.write(INDEX)
    rows = {
        r["sitemap_url"]: r["lastmod"]
        for r in read_sitemap_index(spark, p).collect()
    }
    assert rows == {
        "https://ex.com/sitemap-1.xml.gz": "2026-01-01",
        "https://ex.com/sitemap-2.xml.gz": None,
    }


def test_read_xml_corrupt_record_side_channel(spark, tmp_path):
    """A type-mangled entry routes to _corrupt_record (PERMISSIVE)
    instead of failing the batch; well-formed rows still parse."""
    p = str(tmp_path / "bad.xml")
    with open(p, "w") as f:
        f.write(
            "<urlset>"
            "<url><loc>https://ex.com/ok</loc><priority>0.5</priority></url>"
            "<url><loc>https://ex.com/bad</loc>"
            "<priority>not-a-number</priority></url>"
            "</urlset>"
        )
    # Spark disallows referencing ONLY _corrupt_record on a raw file
    # frame (it would need a second parse) — materialize, then split
    rows = read_xml(spark, p, row_tag="url", schema=SITEMAP_SCHEMA).collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert [r["loc"] for r in good] == ["https://ex.com/ok"]
    assert len(bad) == 1 and good[0]["priority"] == 0.5


def test_sitemap_feeds_url_canonicalizer(spark, tmp_path):
    """The advertised composition: sitemap urls → canonicalize_url
    collapses tracking-param variants of the same page."""
    from hospital_stain_tracker_data_pipeline_spark.operators.web import (
        canonicalize_url,
    )

    p = str(tmp_path / "sitemap.xml")
    with open(p, "w") as f:
        f.write(SITEMAP)
    urls = read_sitemap(spark, p).select(
        canonicalize_url(F.col("url")).alias("canon")
    )
    got = {r["canon"] for r in urls.collect()}
    assert "https://ex.com/a" in got  # utm_source stripped
    assert "https://ex.com/b" in got


def test_read_sitemap_directory_of_shards(spark, tmp_path):
    """A directory of sitemap shards reads as one frontier table —
    the file-source parallelism story."""
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(3):
        with gzip.open(str(d / f"sitemap-{i}.xml.gz"), "wt") as f:
            f.write(
                "<urlset><url><loc>https://ex.com/p/"
                f"{i}</loc></url></urlset>"
            )
    df = read_sitemap(spark, str(d))
    assert df.count() == 3
    assert os.path.isdir(str(d))
