"""WARC (ISO 28500 / WARC 1.0) source — the container format web
crawls actually arrive in (CommonCrawl ships per-record-gzipped
``.warc.gz`` members, ~1 GB per file). This closes the front of the
crawl-to-tokens composition: WARC file → (url, html/text payload)
frame → ``pipeline.curate.curate_documents(html_col=...)``.

The reference has no crawl ingestion at all (its sources are HHS CSVs,
``backend/app/etl/ingest_capacity_csv.py``); this module follows the
repo's extension pattern for binary formats (multimodal/jpeg/flac):
a pure-stdlib parser with its own spec-conformant writer as the
round-trip test rig, and Spark-side plumbing that is real at scale.

Scale shape (100 TB = ~100k x 1 GB warc.gz files): the unit of
parallelism is the FILE — a driver-side listing is tiny (one row per
file), repartitioned so each task stream-parses its files with
``mapInPandas``. Parsing is streaming on both axes: gzip members
decode incrementally (one record's bytes in memory at a time, never
the whole file) and records are emitted in Arrow batches as they
parse, so executor memory is bounded by the largest single record,
not the file. Per-record gzip members (the CommonCrawl layout) also
give random access: the reported ``record_offset`` for ``.gz`` input
is the compressed member offset — exactly the pointer the public CC
index format (CDXJ) stores — so a downstream fetch of one record
seeks straight to it.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterable, Iterator
from email.parser import BytesHeaderParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        # record start: compressed member offset for .gz input (the
        # CommonCrawl CDXJ index convention), raw byte offset otherwise
        T.StructField("record_offset", T.LongType(), False),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        # HTTP envelope (response/request records only, else NULL)
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("http_content_type", T.StringType(), True),
        # payload = HTTP body for application/http records (headers
        # stripped, chunked transfer-coding decoded), raw block
        # otherwise
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------- writer


def write_warc(
    path: str,
    records: Iterable[dict],
    compress: bool = True,
) -> list[int]:
    """Spec-conformant WARC/1.0 writer — the round-trip rig for the
    reader (same role as the MJPEG/FLAC encoders). Each record dict:
    ``warc_type`` (required), ``block`` (bytes, required) plus optional
    ``record_id, target_uri, warc_date, content_type`` header fields.

    ``compress=True`` emits one gzip member PER RECORD (the CommonCrawl
    layout — the resulting file is valid multi-member gzip). Returns
    the list of record start offsets in the written file (compressed
    member offsets when compressed), so tests can pin the reader's
    ``record_offset`` contract exactly."""
    offsets: list[int] = []
    with open(path, "wb") as f:
        for rec in records:
            block = rec["block"]
            headers = [b"WARC/1.0"]
            headers.append(b"WARC-Type: " + rec["warc_type"].encode())
            for key, field in (
                ("record_id", b"WARC-Record-ID"),
                ("target_uri", b"WARC-Target-URI"),
                ("warc_date", b"WARC-Date"),
                ("content_type", b"Content-Type"),
            ):
                if rec.get(key) is not None:
                    headers.append(field + b": " + rec[key].encode())
            headers.append(b"Content-Length: " + str(len(block)).encode())
            raw = _CRLF.join(headers) + _CRLF + _CRLF + block + _CRLF + _CRLF
            offsets.append(f.tell())
            if compress:
                comp = zlib.compressobj(9, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
                f.write(comp.compress(raw) + comp.flush())
            else:
                f.write(raw)
    return offsets


def http_response_block(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
) -> bytes:
    """Build an HTTP/1.1 response block (what a ``response`` record's
    WARC block holds). ``chunked`` applies chunked transfer-coding to
    the body — the reader must undo it."""
    if chunked:
        payload = b""
        # split into two chunks to make the decode loop real
        half = max(1, len(body) // 2)
        for part in (body[:half], body[half:]):
            if part:
                payload += f"{len(part):x}".encode() + _CRLF + part + _CRLF
        payload += b"0" + _CRLF + _CRLF
        te = b"Transfer-Encoding: chunked" + _CRLF
        cl = b""
    else:
        payload = body
        te = b""
        cl = b"Content-Length: " + str(len(body)).encode() + _CRLF
    return (
        b"HTTP/1.1 " + str(status).encode() + b" OK" + _CRLF
        + b"Content-Type: " + content_type.encode() + _CRLF
        + te + cl + _CRLF + payload
    )


# ---------------------------------------------------------------- parser


def _iter_gzip_members(stream) -> Iterator[tuple[int, bytes]]:
    """(compressed_member_offset, decompressed_bytes) per gzip member,
    streaming: only one member's decompressed bytes (one WARC record
    for CC-layout files) are held at a time."""
    offset = 0
    buf = b""
    chunk_size = 1 << 20
    eof = False
    while True:
        while len(buf) < 2 and not eof:
            got = stream.read(chunk_size)
            if not got:
                eof = True
            buf += got
        if not buf:
            return
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = bytearray()
        consumed_into = 0  # bytes of buf fed so far for this member
        while True:
            if consumed_into == len(buf) and not eof:
                got = stream.read(chunk_size)
                if not got:
                    eof = True
                buf += got
            feed = buf[consumed_into:]
            if not feed and d.eof is False:
                # truncated final member: surface what decoded cleanly
                if out:
                    yield offset, bytes(out)
                return
            out += d.decompress(feed)
            consumed_into = len(buf)
            if d.eof:
                tail = d.unused_data
                member_len = len(buf) - len(tail)
                yield offset, bytes(out)
                offset += member_len
                buf = tail
                break


def _iter_plain_records_raw(stream) -> Iterator[tuple[int, bytes]]:
    """(byte_offset, record_bytes) from an uncompressed WARC stream.
    Splits on the version line + Content-Length header — no full-file
    buffering; one record in memory at a time."""
    offset = 0
    buf = bytearray()
    chunk_size = 1 << 20
    eof = False
    while True:
        # ensure we have the full header block (terminated by CRLFCRLF)
        while b"\r\n\r\n" not in buf and not eof:
            got = stream.read(chunk_size)
            if not got:
                eof = True
            buf += got
        if not buf.strip():
            return
        head_end = buf.find(b"\r\n\r\n")
        if head_end < 0:
            return  # trailing garbage without a header block
        head = bytes(buf[:head_end])
        clen = None
        for line in head.split(_CRLF):
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = None
        if clen is None:
            return  # unrecoverable: cannot find the block boundary
        need = head_end + 4 + clen + 4  # block + trailing CRLFCRLF
        while len(buf) < need and not eof:
            got = stream.read(chunk_size)
            if not got:
                eof = True
            buf += got
        rec = bytes(buf[: min(need, len(buf))])
        yield offset, rec
        offset += len(rec)
        buf = buf[len(rec):]
        if eof and not buf.strip():
            return


_header_parser = BytesHeaderParser()


def _dechunk(body: bytes) -> bytes:
    """Undo HTTP chunked transfer-coding; returns ``body`` unchanged if
    it doesn't parse as chunks (bad captures exist in real crawls)."""
    out = bytearray()
    i = 0
    try:
        while True:
            j = body.index(_CRLF, i)
            size = int(body[i:j].split(b";")[0], 16)
            if size == 0:
                return bytes(out)
            out += body[j + 2 : j + 2 + size]
            i = j + 2 + size + 2
    except (ValueError, IndexError):
        return body


def _parse_record(raw: bytes) -> dict | None:
    """One WARC record's bytes → field dict, or None if malformed."""
    if not raw.startswith(b"WARC/"):
        return None
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    first_nl = raw.find(_CRLF)
    fields = _header_parser.parsebytes(raw[first_nl + 2 : head_end + 2])
    try:
        clen = int(fields.get("Content-Length", "").strip())
    except ValueError:
        return None
    block = raw[head_end + 4 : head_end + 4 + clen]
    if len(block) < clen:
        return None  # truncated record
    ctype = fields.get("Content-Type")
    rec = {
        "warc_type": fields.get("WARC-Type"),
        "record_id": fields.get("WARC-Record-ID"),
        "target_uri": fields.get("WARC-Target-URI"),
        "warc_date": fields.get("WARC-Date"),
        "content_type": ctype,
        "http_status": None,
        "http_content_type": None,
        "payload": block,
    }
    if ctype and ctype.split(";")[0].strip().lower() == "application/http":
        split = block.find(b"\r\n\r\n")
        if split >= 0:
            status_line, _, header_bytes = block[:split].partition(_CRLF)
            http = _header_parser.parsebytes(header_bytes + _CRLF)
            body = block[split + 4 :]
            parts = status_line.split()
            if len(parts) >= 2 and parts[0].startswith(b"HTTP/"):
                try:
                    rec["http_status"] = int(parts[1])
                except ValueError:
                    pass
            rec["http_content_type"] = http.get("Content-Type")
            if (http.get("Transfer-Encoding") or "").lower().strip() == "chunked":
                body = _dechunk(body)
            rec["payload"] = body
    return rec


def iter_warc_records(path: str) -> Iterator[tuple[int, dict]]:
    """(record_offset, fields) for every well-formed record in a local
    or ``pyarrow.fs``-resolvable WARC file; malformed records are
    skipped (crawl files DO carry truncated captures — one bad record
    must not kill a 1 GB file, the op-validate-row philosophy applied
    to a binary source)."""
    stream = _open_stream(path)
    try:
        head = stream.read(2)
        stream = _Unread(head, stream)
        members = (
            _iter_gzip_members(stream)
            if head == _GZIP_MAGIC
            else _iter_plain_records_raw(stream)
        )
        for offset, raw in members:
            # a gzip member may carry several records (non-CC writers);
            # all share the member's compressed offset
            pos = 0
            while pos < len(raw):
                if not raw[pos:].strip():
                    break
                rec = _parse_record(raw[pos:])
                if rec is None:
                    break
                yield offset, rec
                pos = _next_record_pos(raw, pos)
    finally:
        stream.close()


def _next_record_pos(raw: bytes, pos: int) -> int:
    head_end = raw.index(b"\r\n\r\n", pos)
    head = raw[pos:head_end]
    clen = 0
    for line in head.split(_CRLF):
        k, _, v = line.partition(b":")
        if k.strip().lower() == b"content-length":
            clen = int(v.strip())
    return head_end + 4 + clen + 4


class _Unread:
    """Prepend already-read bytes back onto a stream."""

    def __init__(self, head: bytes, stream):
        self._head = head
        self._stream = stream

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0 or n >= len(self._head):
                out, self._head = self._head, b""
                return out + self._stream.read(
                    -1 if n is None or n < 0 else n - len(out)
                )
            out, self._head = self._head[:n], self._head[n:]
            return out
        return self._stream.read(n)

    def close(self) -> None:
        self._stream.close()


def _open_stream(path: str):
    if "://" in path:
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(path)
        return filesystem.open_input_stream(p)
    return open(path, "rb")


# ----------------------------------------------------------- spark side


def read_warc(
    spark: SparkSession,
    paths: str | list[str],
    warc_types: tuple[str, ...] = ("response",),
    parallelism: int | None = None,
) -> DataFrame:
    """Distributed WARC scan: expand ``paths`` (a list, a file, or a
    glob) driver-side — listing is one tiny row per file even at
    100 TB — then stream-parse each file in ``mapInPandas`` tasks.
    ``warc_types`` filters record types during the parse (response
    records are the corpus; request/metadata/warcinfo are bookkeeping),
    so filtered records never materialize in Arrow.
    """
    import glob as globmod

    if isinstance(paths, str):
        listed = sorted(globmod.glob(paths)) if any(
            ch in paths for ch in "*?["
        ) else [paths]
    else:
        listed = sorted(paths)
    if not listed:
        return spark.createDataFrame([], WARC_SCHEMA)
    want = set(warc_types) if warc_types else None

    files = spark.createDataFrame(
        [(p,) for p in listed], "warc_file string"
    ).repartition(min(len(listed), parallelism or len(listed)))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["warc_file"]:
                rows = []
                for offset, rec in iter_warc_records(path):
                    if want is not None and rec["warc_type"] not in want:
                        continue
                    rows.append(
                        {
                            "warc_file": path,
                            "record_offset": offset,
                            **{
                                k: rec[k]
                                for k in (
                                    "warc_type", "record_id", "target_uri",
                                    "warc_date", "content_type",
                                    "http_status", "http_content_type",
                                    "payload",
                                )
                            },
                        }
                    )
                    if len(rows) >= 256:  # bound Arrow batch memory
                        yield pd.DataFrame(rows)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(parse, WARC_SCHEMA)


def warc_payload_text(
    df: DataFrame,
    payload_col: str = "payload",
    http_ct_col: str = "http_content_type",
    out_col: str = "text",
) -> DataFrame:
    """Decode payload bytes to a string column using the charset from
    the HTTP Content-Type header (``charset=...``), defaulting to
    UTF-8 with replacement — crawl bytes are never trusted to decode
    cleanly. Arrow-batched; one pass."""

    @F.pandas_udf("string")
    def decode(payload: pd.Series, ct: pd.Series) -> pd.Series:
        out = []
        for raw, c in zip(payload, ct):
            if raw is None:
                out.append(None)
                continue
            charset = "utf-8"
            if isinstance(c, str) and "charset=" in c.lower():
                charset = c.lower().split("charset=")[1].split(";")[0].strip() or "utf-8"
            try:
                out.append(bytes(raw).decode(charset, errors="replace"))
            except LookupError:  # unknown charset label in the wild
                out.append(bytes(raw).decode("utf-8", errors="replace"))
        return pd.Series(out)

    return df.withColumn(out_col, decode(F.col(payload_col), F.col(http_ct_col)))


def warc_to_documents(
    spark: SparkSession,
    paths: str | list[str],
    parallelism: int | None = None,
) -> DataFrame:
    """The crawl front-door: WARC response records →
    ``(doc_id, url, fetch_date, html)`` ready for
    ``curate_documents(..., html_col="html", url_col="url")``.
    ``doc_id`` is the 64-bit hash of (file, offset) — deterministic,
    collision-checked by the exact-dedup stage downstream."""
    recs = read_warc(spark, paths, warc_types=("response",), parallelism=parallelism)
    return (
        warc_payload_text(recs, out_col="html")
        .select(
            F.xxhash64("warc_file", "record_offset").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetch_date"),
            "html",
        )
    )
