"""Minimal PDF text + layout extraction (north_rule: "PDF/layout parse").

Scope: the well-formed text-PDF subset a crawl pipeline can process with no
native dependencies — Tj/TJ text-showing operators in page content streams,
optional FlateDecode (stdlib zlib), positioning via Td/TD/Tm, font size via
Tf.  Layout reconstruction: text items sort top-to-bottom / left-to-right,
nearby baselines merge into lines, small line gaps merge into paragraph
spans, and a line whose font size is >=1.3x the document's median becomes a
heading span — so PDF documents land in the SAME ordered span model
(kind, text, media_ref, offset) as HTML extraction.

The reference rejects non-HTML content types outright
(reference: src/FetchEngine.ts:120-123); routing application/pdf payloads
here is the engine's extension, named by the north rule.  Image-only,
encrypted, or malformed PDFs land in the error column — per-document
failures never fail the stage (same contract as extract.py).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .extract import OUTPUT_SCHEMA, SPAN_TYPE  # noqa: F401  (span model shared)
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PDF_OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
        StructField("n_pages", IntegerType()),
        StructField("n_text_items", LongType()),
        StructField("error", StringType()),
    ]
)

_OBJ_RX = re.compile(rb"\d+\s+0\s+obj\b(.*?)endobj", re.S)
_STREAM_RX = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)

_TOKEN_RX = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^\\()])*\))      # (string) with escapes
  | (?P<hex><(?!<)[0-9A-Fa-f\s]*>)     # <hex string> (not a << dict >>)
  | (?P<num>-?\d+(?:\.\d+)?)           # number
  | (?P<name>/[^\s/\[\]()<>{}%]+)      # /Name
  | (?P<arr>\[|\])
  | (?P<op>[A-Za-z'"]{1,3}\*?)         # operator
    """,
    re.X,
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """(string) body → text, handling backslash escapes and octal codes."""
    out = bytearray()
    i = 0
    body = raw[1:-1]
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            m = re.match(rb"[0-7]{1,3}", body[i + 1 : i + 4])
            if m:
                out.append(int(m.group(), 8))
                i += 1 + len(m.group())
                continue
            i += 1  # line continuation / unknown escape: drop the backslash
            continue
        out += c
        i += 1
    return out.decode("latin-1")


def _content_streams(data: bytes) -> list[bytes]:
    """Decoded content streams in object order (the page order of the
    simple-PDF subset this parser targets)."""
    streams = []
    for m in _OBJ_RX.finditer(data):
        body = m.group(1)
        sm = _STREAM_RX.search(body)
        if not sm:
            continue
        raw = sm.group(1)
        head = body[: sm.start()]
        if b"/FlateDecode" in head:
            raw = zlib.decompress(raw)
        if b"BT" in raw:
            streams.append(raw)
    return streams


def _text_items(stream: bytes) -> list[tuple[float, float, float, str]]:
    """(x, y, font_size, text) per text-showing operator."""
    items: list[tuple[float, float, float, str]] = []
    nums: list[float] = []
    strs: list[str] = []
    in_array = False
    arr_parts: list[str] = []
    size = 11.0
    x = y = 0.0
    for m in _TOKEN_RX.finditer(stream):
        kind = m.lastgroup
        tok = m.group()
        if kind in ("str", "hex"):
            if kind == "str":
                s = _decode_pdf_string(tok)
            else:
                h = re.sub(rb"\s", b"", tok[1:-1])
                if len(h) % 2:
                    h += b"0"  # PDF spec: odd-length hex pads with 0
                s = bytes.fromhex(h.decode("ascii")).decode("latin-1")
            if in_array:
                arr_parts.append(s)
            else:
                strs.append(s)
        elif kind == "num":
            nums.append(float(tok))
        elif kind == "arr":
            if tok == b"[":
                in_array = True
                arr_parts = []
            else:
                in_array = False
        elif kind == "op":
            op = tok
            if op == b"BT":
                x = y = 0.0
            elif op == b"Tf" and nums:
                size = nums[-1]
            elif op in (b"Td", b"TD") and len(nums) >= 2:
                x += nums[-2]
                y += nums[-1]
            elif op == b"Tm" and len(nums) >= 6:
                x, y = nums[-2], nums[-1]
            elif op == b"Tj" and strs:
                items.append((x, y, size, strs[-1]))
            elif op == b"TJ" and arr_parts:
                items.append((x, y, size, "".join(arr_parts)))
                arr_parts = []
            nums = []
            strs = []
    return items


def parse_pdf_spans(data: bytes) -> tuple[list[dict], int, int]:
    """PDF bytes → (ordered spans, n_pages, n_text_items).

    Layout: per page, items sort by (-y, x); baselines within 2pt merge
    into a line (left-to-right, space-joined); consecutive same-size lines
    with a vertical gap <= 1.8x the font size merge into one paragraph
    span; a line at >=1.3x the document median font size is a heading.
    """
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if b"/Encrypt" in data:
        raise ValueError("encrypted PDF not supported")
    pages = _content_streams(data)
    all_items = [(_p, it) for _p, s in enumerate(pages) for it in _text_items(s)]
    if not all_items:
        if not pages:
            raise ValueError("no content streams (image-only or unsupported PDF)")
        return [], len(pages), 0

    sizes = sorted(sz for _, (_x, _y, sz, _t) in all_items)
    # lower-middle median: body text must win the tie in heading-heavy docs
    median_size = sizes[(len(sizes) - 1) // 2]

    spans: list[dict] = []
    for p in range(len(pages)):
        items = sorted(
            (it for pg, it in all_items if pg == p), key=lambda it: (-it[1], it[0])
        )
        # group into lines by baseline proximity
        lines: list[tuple[float, float, str]] = []  # (y, size, text)
        for ix, iy, isz, itx in items:
            if lines and abs(lines[-1][0] - iy) <= 2.0:
                py, psz, ptx = lines[-1]
                lines[-1] = (py, max(psz, isz), f"{ptx} {itx}")
            else:
                lines.append((iy, isz, itx))
        # merge lines into paragraph/heading spans
        prev_y = prev_size = None
        for ly, lsz, ltx in lines:
            is_heading = lsz >= 1.3 * median_size
            gap_merge = (
                spans
                and prev_y is not None
                and not is_heading
                and prev_size == lsz
                and spans[-1]["kind"] == "text"
                and (prev_y - ly) <= 1.8 * lsz
            )
            text = ltx.strip()
            if not text:
                continue
            if gap_merge:
                spans[-1]["text"] += " " + text
            else:
                spans.append(
                    {
                        "kind": "heading" if is_heading else "text",
                        "text": text,
                        "media_ref": None,
                        "offset": len(spans),
                    }
                )
            prev_y, prev_size = ly, lsz
    return spans, len(pages), len(all_items)


def _extract_pdf_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k: [] for k in PDF_OUTPUT_SCHEMA.names}
        for row in pdf.itertuples(index=False):
            error = None
            spans: list[dict] = []
            n_pages = 0
            n_items = 0
            try:
                payload = bytes(row.payload) if row.payload is not None else b""
                spans, n_pages, n_items = parse_pdf_spans(payload)
            except Exception as exc:  # never fail the stage on one bad doc
                error = f"ERR_PDF: {type(exc).__name__}: {exc}"[:300]
            out["doc_id"].append(row.doc_id)
            out["spans"].append(spans)
            out["n_pages"].append(n_pages)
            out["n_text_items"].append(n_items)
            out["error"].append(error)
        yield pd.DataFrame(out)


def extract_pdf_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, payload binary) → (doc_id, spans, n_pages,
    n_text_items, error) — one Arrow-batched Python stage, same span model
    and never-fail contract as the HTML extraction stage."""
    sel = documents.select("doc_id", "payload")
    return sel.mapInPandas(_extract_pdf_batches, schema=PDF_OUTPUT_SCHEMA)
