"""WARC source tests (sources/warc.py): spec round-trip through the
module's own writer (the codec-rig pattern), CommonCrawl-layout gzip
member offsets, HTTP envelope parsing incl. chunked transfer-coding
and charset decode, malformed-record resilience, partitioning
determinism, and the crawl-to-tokens composition into
``curate_documents``."""

from __future__ import annotations

import gzip

import pytest

from hospital_stain_tracker_data_pipeline_spark.sources.warc import (
    http_response_block,
    iter_warc_records,
    read_warc,
    warc_payload_text,
    warc_to_documents,
    write_warc,
)


def _sample_records():
    body_a = b"<html><head><title>A</title></head><body>alpha beta gamma delta epsilon zeta eta theta</body></html>"
    body_b = "<html><body>café résumé and plenty of the usual prose for the funnel</body></html>".encode(
        "latin-1"
    )
    return [
        {
            "warc_type": "warcinfo",
            "block": b"software: test-rig/1.0\r\n",
            "record_id": "<urn:uuid:00000000-0000-0000-0000-000000000001>",
            "warc_date": "2026-08-14T00:00:00Z",
            "content_type": "application/warc-fields",
        },
        {
            "warc_type": "request",
            "block": b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n",
            "record_id": "<urn:uuid:00000000-0000-0000-0000-000000000002>",
            "target_uri": "http://a.example/",
            "content_type": "application/http; msgtype=request",
        },
        {
            "warc_type": "response",
            "block": http_response_block(body_a),
            "record_id": "<urn:uuid:00000000-0000-0000-0000-000000000003>",
            "target_uri": "http://a.example/",
            "warc_date": "2026-08-14T00:00:01Z",
            "content_type": "application/http; msgtype=response",
        },
        {
            "warc_type": "response",
            "block": http_response_block(
                body_b,
                status=404,
                content_type="text/html; charset=latin-1",
                chunked=True,
            ),
            "record_id": "<urn:uuid:00000000-0000-0000-0000-000000000004>",
            "target_uri": "http://b.example/missing",
            "warc_date": "2026-08-14T00:00:02Z",
            "content_type": "application/http; msgtype=response",
        },
        {
            "warc_type": "metadata",
            "block": b"fetchTimeMs: 12\r\n",
            "record_id": "<urn:uuid:00000000-0000-0000-0000-000000000005>",
            "target_uri": "http://a.example/",
            "content_type": "application/warc-fields",
        },
    ], body_a, body_b


@pytest.mark.parametrize("compress", [True, False], ids=["gz", "plain"])
def test_roundtrip_all_record_types(tmp_path, compress):
    records, body_a, body_b = _sample_records()
    ext = "warc.gz" if compress else "warc"
    path = str(tmp_path / f"rt.{ext}")
    offsets = write_warc(path, records, compress=compress)

    got = list(iter_warc_records(path))
    assert [o for o, _ in got] == offsets  # offset contract, both layouts
    assert [r["warc_type"] for _, r in got] == [
        "warcinfo", "request", "response", "response", "metadata",
    ]
    # non-http records keep the raw block as payload
    assert got[0][1]["payload"] == b"software: test-rig/1.0\r\n"
    assert got[0][1]["http_status"] is None
    # http request: headers stripped, empty body
    assert got[1][1]["payload"] == b""
    # plain response: body extracted, status + content-type parsed
    assert got[2][1]["payload"] == body_a
    assert got[2][1]["http_status"] == 200
    assert got[2][1]["http_content_type"] == "text/html; charset=utf-8"
    # chunked response: transfer-coding undone, latin-1 charset kept
    assert got[3][1]["payload"] == body_b
    assert got[3][1]["http_status"] == 404
    assert got[3][1]["target_uri"] == "http://b.example/missing"
    for (_, r), want in zip(got, records):
        assert r["record_id"] == want["record_id"]


def test_gz_offsets_are_member_starts(tmp_path):
    """CommonCrawl index convention: each .gz record offset must be a
    real gzip member start — decompressing the file tail from that
    offset yields the record."""
    records, _, _ = _sample_records()
    path = str(tmp_path / "m.warc.gz")
    offsets = write_warc(path, records, compress=True)
    blob = open(path, "rb").read()
    for off, want in zip(offsets, records):
        member = gzip.decompress(blob[off:])  # multi-member tail
        assert member.startswith(b"WARC/1.0\r\n")
        assert ("WARC-Type: " + want["warc_type"]).encode() in member.split(
            b"\r\n\r\n"
        )[0]


def test_malformed_record_skipped_not_fatal(tmp_path):
    """A truncated capture mid-file must not kill the scan: records
    before the corruption all parse (op-validate-row philosophy on a
    binary source)."""
    records, _, _ = _sample_records()
    path = str(tmp_path / "bad.warc.gz")
    write_warc(path, records, compress=True)
    with open(path, "ab") as f:
        # trailing garbage member: valid gzip, invalid WARC inside
        f.write(gzip.compress(b"NOT-A-WARC-RECORD"))
    got = list(iter_warc_records(path))
    assert len(got) == len(records)
    # and a final gzip member truncated MID-DEFLATE-STREAM (a cut that
    # only clips the 8-byte gzip trailer still yields the full record —
    # the deflate data is complete — so cut into the member body)
    path2 = str(tmp_path / "trunc.warc.gz")
    offs = write_warc(path2, records, compress=True)
    blob = open(path2, "rb").read()
    open(path2, "wb").write(blob[: offs[-1] + 10])
    got2 = list(iter_warc_records(path2))
    assert len(got2) == len(records) - 1  # last record lost, rest fine


def test_read_warc_dataframe(spark, tmp_path):
    records, body_a, body_b = _sample_records()
    p1 = str(tmp_path / "a.warc.gz")
    p2 = str(tmp_path / "b.warc")
    write_warc(p1, records, compress=True)
    write_warc(p2, records, compress=False)

    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = df.collect()
    # default type filter: response records only, from both files
    assert len(rows) == 4
    assert {r["warc_type"] for r in rows} == {"response"}
    assert {bytes(r["payload"]) for r in rows} == {body_a, body_b}

    all_types = read_warc(spark, [p1], warc_types=()).collect()
    assert len(all_types) == len(records)

    # partitioning determinism: 1 task vs 2 tasks, same rows
    one = {(r["warc_file"], r["record_offset"]) for r in
           read_warc(spark, [p1, p2], parallelism=1).collect()}
    two = {(r["warc_file"], r["record_offset"]) for r in
           read_warc(spark, [p1, p2], parallelism=2).collect()}
    assert one == two and len(one) == 4


def test_warc_payload_text_charset(spark, tmp_path):
    records, body_a, body_b = _sample_records()
    path = str(tmp_path / "cs.warc.gz")
    write_warc(path, records, compress=True)
    df = warc_payload_text(read_warc(spark, [path]))
    by_uri = {r["target_uri"]: r["text"] for r in df.collect()}
    assert "café résumé" in by_uri["http://b.example/missing"]
    assert "alpha beta gamma" in by_uri["http://a.example/"]


def test_warc_to_documents_curate_composition(spark, tmp_path):
    """Crawl-to-tokens end-to-end: WARC response records → documents
    frame → curate_documents(html_col=...) extracts prose and the
    funnel sees real text."""
    from hospital_stain_tracker_data_pipeline_spark.pipeline.curate import (
        curate_documents,
    )

    records, _, _ = _sample_records()
    path = str(tmp_path / "c.warc.gz")
    write_warc(path, records, compress=True)
    docs = warc_to_documents(spark, [path])
    rows = docs.collect()
    assert len(rows) == 2
    assert {r["url"] for r in rows} == {
        "http://a.example/", "http://b.example/missing",
    }
    assert len({r["doc_id"] for r in rows}) == 2  # deterministic, distinct
    # twice the same scan = same ids (hash of file+offset, no uuids)
    again = {r["doc_id"] for r in warc_to_documents(spark, [path]).collect()}
    assert again == {r["doc_id"] for r in rows}

    # the HTML stage extracts prose (and drops the raw markup column)
    from hospital_stain_tracker_data_pipeline_spark.operators.web import (
        parse_html_documents,
    )

    prose = {
        r["text"]
        for r in parse_html_documents(docs, html_col="html").collect()
    }
    assert any("alpha beta gamma" in t for t in prose)
    assert all("<html>" not in t and "<body>" not in t for t in prose)

    chunks, report = curate_documents(docs, html_col="html", url_col="url")
    assert report.total == 2
    assert report.after_quality == 2      # both pages carry real prose
    assert report.after_url_dedup == 2    # distinct canonical urls
    assert report.chunks >= 1
    # token mass is the EXTRACTED prose, not the markup: the packed
    # total must match the whitespace token count of the prose exactly
    want_tokens = sum(len(t.split()) for t in prose)
    assert report.packed_tokens == want_tokens
    assert chunks.count() > 0
