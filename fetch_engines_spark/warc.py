"""WARC ingestion: the standard landing format of web-scale crawls
(Common Crawl ships ~1 GB ``.warc.gz`` files of per-record gzip members).

Scale shape: ``read_warc`` scans with the binaryFile source — ONE task
per WARC file, the standard parallelism for this layout (gzip members
are not block-splittable; CC sizes files ~1 GB precisely so that
per-file tasks balance).  Each task streams its file through the
stdlib-only parser below and emits one row per record; a malformed file
becomes one error row, never a stage failure (same never-fail contract
as the extraction and media stages).  Decompression is bomb-guarded:
output is capped per record and in total, so a crafted member errors
instead of OOMing the executor.

Reference parity: the reference fetches live pages (its S1 operator);
a batch engine over a landed crawl ingests the same content from WARC —
`warc_html_documents` adapts response records directly into the
engine's interleaved-span `documents` shape for extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAX_WARC_RECORD_BYTES = 64 * 1024 * 1024  # one record's block
# Total inflated bytes per file.  A production ~1 GB .warc.gz inflates to
# ~3-5 GB (CC targets the COMPRESSED size), so the cap must clear that
# with headroom while still bounding a decompression bomb well below
# executor memory.
MAX_WARC_FILE_BYTES = 8 * 1024 * 1024 * 1024


def _gunzip_members(data: bytes, max_total: int) -> bytes:
    """Concatenated gzip members → inflated bytes (the WARC layout gzips
    each record as its own member).  Offset-based walk: each member's
    decompressobj is fed bounded memoryview chunks, so per-member cost is
    proportional to the member's own size — a tail re-slice per member
    (``rest = d.unused_data``) is quadratic over the ~50k members of a
    production archive.  Bounded: raises past ``max_total``."""
    import zlib as _z

    out = bytearray()
    mv = memoryview(data)
    pos, n = 0, len(data)
    chunk_size = 1 << 20
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            # NUL padding after the last member is tolerated; anything
            # else is trailing garbage
            if data.count(0, pos) != n - pos:
                raise ValueError("trailing bytes after the last gzip member")
            break
        d = _z.decompressobj(wbits=31)
        while not d.eof:
            if pos >= n:
                raise ValueError("truncated gzip member")
            chunk = mv[pos : pos + chunk_size]
            # max_length is always >= 1 here (cap check below), so this
            # never hits zlib's max_length=0 == unlimited
            out += d.decompress(chunk, max_total + 1 - len(out))
            if len(out) > max_total:
                raise ValueError("WARC inflates past the per-file cap")
            pos += len(chunk) - len(d.unused_data) - len(d.unconsumed_tail)
    return bytes(out)


def _zstd_decompress_frames(data: bytes, max_total: int) -> bytes:
    """Multi-frame ``.warc.zst`` → inflated bytes.  Real CC zstd archives
    are MULTI-frame (often led by a skippable dictionary frame); one-shot
    ``ZstdDecompressor.decompress`` stops after the first frame — silent
    record loss.  Streaming with ``read_across_frames=True`` walks every
    frame (libzstd skips skippable frames transparently).  Bounded:
    raises past ``max_total``."""
    import io

    import zstandard

    dctx = zstandard.ZstdDecompressor()
    out = bytearray()
    with dctx.stream_reader(io.BytesIO(data), read_across_frames=True) as r:
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            out += chunk
            if len(out) > max_total:
                raise ValueError("WARC inflates past the per-file cap")
    return bytes(out)


def _parse_header_lines(raw: bytes, strict: bool) -> dict[str, str]:
    """CRLF-separated header lines → dict (keys lowercased).  Lines
    starting with SP/HT are legal folded continuations (WARC 1.0
    grammar) and append to the previous header's value; with
    ``strict=True`` a colon-less non-continuation line raises."""
    headers: dict[str, str] = {}
    last_key: str | None = None
    for line in raw.split(b"\r\n"):
        if line[:1] in (b" ", b"\t") and last_key is not None:
            headers[last_key] += " " + line.strip().decode("latin-1")
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            if strict:
                raise ValueError(f"malformed WARC header line {line[:40]!r}")
            last_key = None
            continue
        last_key = k.strip().decode("latin-1").lower()
        headers[last_key] = v.strip().decode("latin-1")
    return headers


def parse_warc(
    data: bytes,
    max_record_bytes: int = MAX_WARC_RECORD_BYTES,
    partial: bool = False,
) -> list[dict]:
    """WARC 1.0/1.1 bytes (plain or gzip members) → list of record dicts:
    ``{warc_type, record_id, target_uri, warc_date, content_type,
    content_length, http_status, http_content_type, payload}``.

    For ``response``/``revisit`` records whose block is an HTTP message,
    the status line + headers are split off: ``http_status`` and
    ``http_content_type`` come from the HTTP head and ``payload`` is the
    HTTP BODY; for every other record ``payload`` is the raw block.
    Raises ValueError on malformed input (the Spark stage maps that to
    an error row).

    ``partial=True`` bounds the blast radius of one bad record to the
    file TAIL instead of the whole file: records parsed before the bad
    byte are returned, followed by a ``{"_partial_error": msg}`` sentinel
    (a ~50k-record archive should not lose every record to one malformed
    header).  Whole-file problems — bad compression, no version line,
    zero records — always raise."""
    if data is None or len(data) < 4:
        raise ValueError("not a WARC payload")
    if data[:4] == b"\x28\xb5\x2f\xfd":
        # .warc.zst (newer Common Crawl drops): no zstd codec in this
        # environment's stdlib; use it when present, else an honest
        # error row rather than a misparse
        try:
            import zstandard  # noqa: F401
        except ImportError:
            raise ValueError(
                "zstd-compressed WARC but no zstd codec available in this "
                "environment (install zstandard)"
            ) from None
        data = _zstd_decompress_frames(data, MAX_WARC_FILE_BYTES)
    elif data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data, MAX_WARC_FILE_BYTES)
    if not data.startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    records: list[dict] = []
    pos = 0
    n = len(data)
    try:
        while pos < n:
            # skip inter-record CRLFs (a CRLF pair can never begin a
            # "WARC/" version line, so no lookahead is needed — and a
            # tail-slice lookahead per pair is O(records x file size))
            while data.startswith(b"\r\n", pos):
                pos += 2
            if pos >= n:
                break
            eol = data.find(b"\r\n", pos)
            if eol < 0 or not data.startswith(b"WARC/", pos):
                raise ValueError(f"expected WARC version line at byte {pos}")
            head_end = data.find(b"\r\n\r\n", eol)
            if head_end < 0:
                raise ValueError("truncated WARC header")
            headers = _parse_header_lines(data[eol + 2 : head_end], strict=True)
            try:
                clen = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError("missing/invalid Content-Length") from None
            if clen < 0 or clen > max_record_bytes:
                raise ValueError(f"record block of {clen} bytes exceeds the cap")
            block_start = head_end + 4
            block = data[block_start : block_start + clen]
            if len(block) != clen:
                raise ValueError("truncated record block")
            pos = block_start + clen
            wtype = headers.get("warc-type", "")
            http_status = None
            http_ct = None
            payload = block
            if wtype in ("response", "revisit") and block[:5] == b"HTTP/":
                hend = block.find(b"\r\n\r\n")
                if hend < 0:
                    raise ValueError("truncated HTTP head in response record")
                http_lines = block[:hend].split(b"\r\n")
                status_parts = http_lines[0].split(b" ", 2)
                if len(status_parts) < 2 or not status_parts[1].isdigit():
                    raise ValueError("malformed HTTP status line")
                http_status = int(status_parts[1])
                http_headers = _parse_header_lines(
                    block[len(http_lines[0]) + 2 : hend], strict=False
                )
                http_ct = http_headers.get("content-type")
                payload = block[hend + 4 :]
            records.append(
                {
                    "warc_type": wtype,
                    # None (not "") when absent, so the documents
                    # adapter's coalesce-to-url fallback actually fires
                    "record_id": headers.get("warc-record-id") or None,
                    "target_uri": headers.get("warc-target-uri"),
                    "warc_date": headers.get("warc-date"),
                    "content_type": headers.get("content-type"),
                    "content_length": clen,
                    "http_status": http_status,
                    "http_content_type": http_ct,
                    "payload": payload,
                }
            )
    except ValueError as exc:
        if not partial or not records:
            raise
        records.append(
            {"_partial_error": f"{exc} (after {len(records)} parsed records)"}
        )
        return records
    if not records:
        raise ValueError("no WARC records")
    return records


WARC_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("url", StringType()),
        StructField("warc_date", StringType()),
        StructField("content_type", StringType()),
        StructField("content_length", LongType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("error", StringType()),
    ]
)


def _warc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in WARC_SCHEMA.names}

        def emit(path, rec, err):
            out["warc_file"].append(path)
            out["record_id"].append(rec.get("record_id") if rec else None)
            out["warc_type"].append(rec.get("warc_type") if rec else None)
            out["url"].append(rec.get("target_uri") if rec else None)
            out["warc_date"].append(rec.get("warc_date") if rec else None)
            out["content_type"].append(rec.get("content_type") if rec else None)
            out["content_length"].append(rec.get("content_length") if rec else None)
            out["http_status"].append(rec.get("http_status") if rec else None)
            out["http_content_type"].append(rec.get("http_content_type") if rec else None)
            out["payload"].append(rec.get("payload") if rec else None)
            out["error"].append(err)

        for row in pdf.itertuples(index=False):
            try:
                recs = parse_warc(
                    bytes(row.content) if row.content is not None else None,
                    partial=True,
                )
            except Exception as exc:
                emit(row.path, None, f"ERR_WARC: {type(exc).__name__}: {exc}"[:200])
                continue
            for rec in recs:
                if "_partial_error" in rec:
                    emit(
                        row.path,
                        None,
                        f"ERR_WARC_PARTIAL: {rec['_partial_error']}"[:200],
                    )
                else:
                    emit(row.path, rec, None)
        yield pd.DataFrame(out)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → one row per record (plus one error row per
    malformed file).  binaryFile scan: one task per file — the standard
    parallelism for gzip-member WARC; list a directory/glob of files for
    cluster-wide fan-out."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_warc_batches, schema=WARC_SCHEMA)


def warc_html_documents(warc: DataFrame) -> DataFrame:
    """HTTP-200 HTML response records → the engine's interleaved-span
    ``documents`` shape (doc_id, base_url, canonical_url, spans with one
    html span), ready for ``extract_spans``.  Charset: the HTTP
    Content-Type charset parameter is honored via the S2 operator
    (``classifiers.decode_if_text`` — latin-1/ascii/utf-16 map to their
    JVM codecs, anything else decodes UTF-8 with replacement); the web
    is full of latin-1, and decoding everything as UTF-8 would silently
    mangle it."""
    from pyspark.sql import functions as F

    from .classifiers import decode_if_text

    html = warc.filter(
        (F.col("error").isNull())
        & (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.lower(F.coalesce("http_content_type", F.lit(""))).contains("text/html")
    )
    return html.select(
        F.coalesce("record_id", "url").alias("doc_id"),
        F.col("url").alias("base_url"),
        F.col("url").alias("canonical_url"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                decode_if_text(F.col("payload"), F.col("http_content_type")).alias(
                    "text"
                ),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
