"""JSONL source/sink contract: explicit schema (no inference), corrupt
lines and missing required fields routed to the reject side with
reasons, and a write→read round trip that preserves the documents
fixture exactly."""

from __future__ import annotations

import os

from hospital_stain_tracker_data_pipeline_spark.sources.jsonl import (
    read_jsonl,
    write_jsonl,
)
from hospital_stain_tracker_data_pipeline_spark.sources.tables import (
    load_fixture_table,
)


def test_jsonl_roundtrip_documents(spark, sf_dir, tmp_path):
    docs = load_fixture_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.select("doc_id", "lang", "text"), out)
    valid, rejected = read_jsonl(spark, out)
    assert rejected.count() == 0
    a = sorted(tuple(r) for r in docs.select("doc_id", "lang", "text").collect())
    b = sorted(tuple(r) for r in valid.collect())
    assert a == b


def test_jsonl_rejects_malformed_and_missing(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en", "text": "good row"}\n'
        "this is not json\n"
        '{"doc_id": 2, "lang": "en"}\n'          # missing required text
        '{"lang": "en", "text": "no id"}\n'      # missing required doc_id
        '{"doc_id": 3, "text": "no lang ok"}\n'  # lang not required
    )
    valid, rejected = read_jsonl(spark, str(p))
    assert {r.doc_id for r in valid.collect()} == {1, 3}
    reasons = sorted(r._reject_reason for r in rejected.collect())
    assert reasons == [
        "doc_id is required", "malformed json", "text is required",
    ]
