"""Minimal PDF text + layout extraction (north_rule: "PDF/layout parse").

Scope: the well-formed text-PDF subset a crawl pipeline can process with no
native dependencies — Tj/TJ text-showing operators in page content streams,
optional FlateDecode (stdlib zlib), positioning via Td/TD/Tm, font size via
Tf.  Layout reconstruction: text items sort top-to-bottom / left-to-right,
nearby baselines merge into lines, small line gaps merge into paragraph
spans, and a line whose font size is >=1.3x the document's median becomes a
heading span — so PDF documents land in the SAME ordered span model
(kind, text, media_ref, offset) as HTML extraction.

Document structure: pages come from the real page tree (catalog → /Pages →
/Kids walk, cycle-guarded), so physical object order in the file is
irrelevant; documents without a walkable tree fall back to
content-stream-in-object-order.  Text decoding: fonts carrying a
/ToUnicode CMap (bfchar/bfrange, 1- or 2-byte codes) decode through it —
non-Latin text-PDFs (Cyrillic, Greek, CJK identity encodings) extract
correctly; fonts without one decode latin-1.  Remaining subset limits:
bfrange array destinations map single BMP chars, predefined (non-embedded)
CMaps by name are not bundled, and xref/linearization tables are ignored
(object scan instead).

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

# keyword-anchored like _STREAM_START_RX: must not match the suffix of
# words like "downstream\n" occurring before the real stream keyword
_STREAM_RX = re.compile(rb"(?<![A-Za-z])stream\r?\n(.*?)\r?\nendstream", re.S)

_TOKEN_RX = re.compile(
    rb"""
    (?P<str>\((?:\\.|[^\\()])*\))      # (string) with escapes
  | (?P<hex><(?!<)[0-9A-Fa-f\s]*>)     # <hex string> (not a << dict >>)
  | (?P<num>-?(?:\d+(?:\.\d+)?|\.\d+))  # number (incl. leading-dot reals)
  | (?P<name>/[^\s/\[\]()<>{}%]+)      # /Name
  | (?P<arr>\[|\])
  | (?P<op>[A-Za-z'"]{1,3}\*?)         # operator
    """,
    re.X | re.S,  # DOTALL: a string's \\<EOL> continuation spans lines
)

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_string(raw: bytes) -> bytes:
    """(string) body → raw bytes, resolving backslash escapes and octal
    codes (text decoding happens later, per the active font)."""
    out = bytearray()
    i = 0
    body = raw[1:-1]
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in (b"\n", b"\r"):
                # line continuation (PDF 32000 7.3.4.2): backslash AND
                # the EOL marker are both removed
                i += 2
                if nxt == b"\r" and body[i : i + 1] == b"\n":
                    i += 1
                continue
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
    return bytes(out)


def _decode_pdf_string(raw: bytes) -> str:
    """(string) body → text via latin-1 (the no-CMap decoding)."""
    return _unescape_pdf_string(raw).decode("latin-1")


# --- document structure (object map, page tree, fonts) -----------------------

_OBJ_START_RX = re.compile(rb"(\d+)\s+0\s+obj\b")
# keyword-anchored: must not match the suffix of words like "downstream\n"
# inside stream-less object bodies (which would swallow later objects)
_STREAM_START_RX = re.compile(rb"(?<![A-Za-z])stream\r?\n")


def _objects(data: bytes) -> dict[int, bytes]:
    """Object number → body, by stream-aware linear scan (xref tables are
    ignored; a scan tolerates the broken xrefs common in crawled PDFs).

    Stream-aware: compressed stream payloads can contain the byte
    sequences ``endobj`` or ``N 0 obj``, so (a) when a ``stream`` keyword
    precedes the next ``endobj``, the object body extends past the
    matching ``endstream`` before the closing ``endobj`` is searched, and
    (b) object-start matches landing inside a previously consumed object
    are skipped.  (``endstream`` inside the stream bytes themselves
    remains the documented subset limit — resolving it needs /Length
    indirection.)"""
    objs: dict[int, bytes] = {}
    consumed_end = 0
    for m in _OBJ_START_RX.finditer(data):
        if m.start() < consumed_end:
            continue  # byte pattern inside a previous object's stream
        start = m.end()
        end = data.find(b"endobj", start)
        sm = _STREAM_START_RX.search(data, start)
        if sm is not None and end != -1 and sm.start() < end:
            es = data.find(b"endstream", sm.end())
            if es != -1:
                end = data.find(b"endobj", es)
        if end == -1:
            continue
        objs[int(m.group(1))] = data[start:end]
        consumed_end = end + len(b"endobj")
    return objs


def _stream_data(body: bytes) -> bytes | None:
    """Decoded stream payload of an object body (FlateDecode if named)."""
    sm = _STREAM_RX.search(body)
    if not sm:
        return None
    raw = sm.group(1)
    if b"/FlateDecode" in body[: sm.start()]:
        raw = zlib.decompress(raw)
    return raw


def _ref(body: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)\s+0\s+R", body)
    return int(m.group(1)) if m else None


def _contents_refs(body: bytes) -> list[int]:
    m = re.search(rb"/Contents\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", m.group(1))]
    r = _ref(body, b"Contents")
    return [r] if r is not None else []


def _parse_cmap(data: bytes) -> tuple[int, dict[int, str]]:
    """/ToUnicode CMap stream → (code byte-length, code→text map).

    Supports codespacerange (1- or 2-byte codes), bfchar (multi-char
    UTF-16BE destinations), and bfrange with scalar-increment or array
    destinations (array entries: single BMP chars)."""
    code_len = 1
    m = re.search(rb"begincodespacerange\s*<([0-9A-Fa-f]+)>", data)
    if m:
        code_len = max(1, len(m.group(1)) // 2)
    mapping: dict[int, str] = {}
    for seg in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        for src, dst in re.findall(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>", seg):
            mapping[int(src, 16)] = bytes.fromhex(dst.decode("ascii")).decode(
                "utf-16-be", "replace"
            )
    for seg in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        for lo, hi, dst in re.findall(
            rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f]+>)",
            seg,
            re.S,
        ):
            lo_i, hi_i = int(lo, 16), int(hi, 16)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f]+)>", dst)
                for off, d in enumerate(dsts):
                    if lo_i + off <= hi_i:
                        mapping[lo_i + off] = bytes.fromhex(d.decode("ascii")).decode(
                            "utf-16-be", "replace"
                        )
            else:
                base = int(dst[1:-1], 16)
                for c in range(lo_i, min(hi_i, lo_i + 65535) + 1):
                    v = base + (c - lo_i)
                    mapping[c] = chr(v) if v <= 0x10FFFF else "�"
    return code_len, mapping


def _page_fonts(page_body: bytes, objs: dict[int, bytes]) -> dict[str, tuple[int, dict[int, str]]]:
    """Font name → ToUnicode CMap for a page's /Resources/Font dict
    (inline or by reference).  Fonts without /ToUnicode are omitted and
    decode latin-1."""
    res = page_body
    r = _ref(page_body, b"Resources")
    if r is not None and r in objs:
        res = objs[r]
    r = _ref(res, b"Font")
    if r is not None and r in objs:
        font_dict = objs[r]
    else:
        fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
        font_dict = fm.group(1) if fm else b""
    fonts: dict[str, tuple[int, dict[int, str]]] = {}
    for name, ref in re.findall(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+0\s+R", font_dict):
        fobj = objs.get(int(ref))
        if fobj is None:
            continue
        tu = _ref(fobj, b"ToUnicode")
        if tu is None or tu not in objs:
            continue
        stream = _stream_data(objs[tu])
        if stream:
            fonts[name.decode("latin-1")] = _parse_cmap(stream)
    return fonts


def _page_tree_streams(
    objs: dict[int, bytes],
) -> list[tuple[bytes, dict[str, tuple[int, dict[int, str]]]]] | None:
    """Pages in PAGE-TREE order as (joined content stream, fonts) — or
    None when there is no walkable catalog/page tree (caller falls back
    to object order)."""
    catalog = next(
        (b for b in objs.values() if re.search(rb"/Type\s*/Catalog\b", b)), None
    )
    if catalog is None:
        return None
    root = _ref(catalog, b"Pages")
    if root is None:
        return None
    pages: list[int] = []
    seen: set[int] = set()
    stack = [root]
    while stack:  # DFS, cycle-guarded; Kids order is the page order
        ref = stack.pop()
        if ref in seen or ref not in objs or len(seen) > 100_000:
            continue
        seen.add(ref)
        body = objs[ref]
        m = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
        if m:
            kids = [int(x) for x in re.findall(rb"(\d+)\s+0\s+R", m.group(1))]
            stack.extend(reversed(kids))
        elif re.search(rb"/Type\s*/Page\b", body):
            pages.append(ref)
    if not pages:
        return None
    out = []
    for p in pages:
        body = objs[p]
        streams = [
            s
            for r in _contents_refs(body)
            if r in objs
            for s in [_stream_data(objs[r])]
            if s is not None
        ]
        out.append((b"\n".join(streams), _page_fonts(body, objs)))
    return out


def _content_streams(data: bytes) -> list[bytes]:
    """Fallback page model for catalog-less object soup: decoded
    text-bearing content streams in object order.  Reuses the
    STREAM-AWARE object scan (+_stream_data) — the naive non-greedy
    ``(.*?)endobj`` regex this replaces truncated any compressed stream
    whose bytes contain ``endobj``, exactly the corruption _objects was
    hardened against."""
    streams = []
    for body in _objects(data).values():
        raw = _stream_data(body)
        if raw is not None and b"BT" in raw:
            streams.append(raw)
    return streams


def _map_string(raw: bytes, font: tuple[int, dict[int, str]] | None) -> str:
    """Decode a text-show string through the active font's CMap (grouped
    into code units), or latin-1 when the font has none."""
    if font is None:
        return raw.decode("latin-1")
    code_len, mapping = font
    out = []
    for i in range(0, len(raw), code_len):
        code = int.from_bytes(raw[i : i + code_len], "big")
        out.append(mapping.get(code, chr(code) if code < 256 else "�"))
    return "".join(out)


def _text_items(
    stream: bytes,
    fonts: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> list[tuple[float, float, float, str]]:
    """(x, y, font_size, text) per text-showing operator."""
    items: list[tuple[float, float, float, str]] = []
    nums: list[float] = []
    strs: list[bytes] = []
    names: list[bytes] = []
    in_array = False
    arr_parts: list[bytes] = []
    size = 11.0
    x = y = 0.0
    leading = 0.0
    cur_font: tuple[int, dict[int, str]] | None = None
    for m in _TOKEN_RX.finditer(stream):
        kind = m.lastgroup
        tok = m.group()
        if kind in ("str", "hex"):
            if kind == "str":
                s = _unescape_pdf_string(tok)
            else:
                h = re.sub(rb"\s", b"", tok[1:-1])
                if len(h) % 2:
                    h += b"0"  # PDF spec: odd-length hex pads with 0
                s = bytes.fromhex(h.decode("ascii"))
            if in_array:
                arr_parts.append(s)
            else:
                strs.append(s)
        elif kind == "num":
            nums.append(float(tok))
        elif kind == "name":
            names.append(tok[1:])
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
                if fonts and names:
                    cur_font = fonts.get(names[-1].decode("latin-1"))
            elif op in (b"Td", b"TD") and len(nums) >= 2:
                x += nums[-2]
                y += nums[-1]
                if op == b"TD":  # TD also sets the leading to -ty
                    leading = -nums[-1]
            elif op == b"TL" and nums:
                leading = nums[-1]
            elif op == b"T*":
                y -= leading
            elif op == b"Tm" and len(nums) >= 6:
                x, y = nums[-2], nums[-1]
            elif op == b"Tj" and strs:
                items.append((x, y, size, _map_string(strs[-1], cur_font)))
            elif op in (b"'", b'"') and strs:
                # move-and-show: next line, then show (the " variant's
                # word/char spacing operands do not shift the baseline)
                y -= leading
                items.append((x, y, size, _map_string(strs[-1], cur_font)))
            elif op == b"TJ" and arr_parts:
                items.append(
                    (x, y, size, "".join(_map_string(p, cur_font) for p in arr_parts))
                )
                arr_parts = []
            nums = []
            strs = []
            names = []
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
    # encryption lives in the TRAILER dictionary — a whole-file substring
    # scan falsely rejects readable PDFs that merely CONTAIN the bytes
    # "/Encrypt" (e.g. documentation about PDF security)
    for m in re.finditer(rb"trailer", data):
        if b"/Encrypt" in data[m.end() : m.end() + 2048]:
            raise ValueError("encrypted PDF not supported")
    paged = _page_tree_streams(_objects(data))
    if paged is None:  # catalog-less object soup: object-order fallback
        paged = [(s, {}) for s in _content_streams(data)]
    else:
        paged = [(s, f) for s, f in paged if b"BT" in s]
    pages = [s for s, _ in paged]
    all_items = [
        (_p, it) for _p, (s, fonts) in enumerate(paged) for it in _text_items(s, fonts)
    ]
    if not all_items:
        if not pages:
            raise ValueError("no content streams (image-only or unsupported PDF)")
        return [], len(pages), 0

    sizes = sorted(sz for _, (_x, _y, sz, _t) in all_items)
    # lower-middle median: body text must win the tie in heading-heavy docs
    median_size = sizes[(len(sizes) - 1) // 2]

    per_page: list[list] = [[] for _ in range(len(pages))]
    for pg, it in all_items:  # one pass, not one rescan per page
        per_page[pg].append(it)
    spans: list[dict] = []
    for p in range(len(pages)):
        items = sorted(per_page[p], key=lambda it: (-it[1], it[0]))
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
