"""PDF/layout-parse tests (north_rule term; the reference rejects non-HTML
content outright — FetchEngine.ts:120-123 — so the oracle here is the
fixture generator's record of what was placed on each page)."""

import os

import pyarrow.parquet as pq
import pytest

from fetch_engines_spark.pdf import _decode_pdf_string, parse_pdf_spans

FIXTURES = os.path.join(os.path.dirname(__file__), "..", "data", "fixtures")


@pytest.fixture(scope="module")
def pdf_rows():
    return {r["doc_id"]: r for r in pq.read_table(os.path.join(FIXTURES, "pdfs.parquet")).to_pylist()}


def test_all_fixture_pdfs_roundtrip(pdf_rows):
    for doc_id, r in pdf_rows.items():
        if r["exp_error_prefix"]:
            with pytest.raises(ValueError):
                parse_pdf_spans(bytes(r["payload"]))
            continue
        spans, n_pages, _ = parse_pdf_spans(bytes(r["payload"]))
        got = [(s["kind"], s["text"], s["offset"]) for s in spans]
        exp = [(e["kind"], e["text"], e["offset"]) for e in r["exp_spans"]]
        assert got == exp, doc_id
        assert n_pages == r["exp_n_pages"], doc_id


def test_pdf_string_escapes():
    assert _decode_pdf_string(rb"(a\(b\)c)") == "a(b)c"
    assert _decode_pdf_string(rb"(\101\102\15)") == "AB\r"
    assert _decode_pdf_string(rb"(tab\there)") == "tab\there"
    assert _decode_pdf_string(rb"(back\\slash)") == "back\\slash"


def test_layout_orders_top_to_bottom_left_to_right():
    import scripts.build_fixture_data as bfd

    stream = b"\n".join(
        [
            bfd._pdf_line(11, 300, 500, "B2"),
            bfd._pdf_line(11, 72, 700, "A1"),
            bfd._pdf_line(11, 72, 500, "B1"),
        ]
    )
    spans, _, _ = parse_pdf_spans(bfd._pdf_bytes([stream]))
    # A1 is higher; B1/B2 share a baseline and join left-to-right; the
    # big vertical gap (200pt) separates the paragraphs
    assert [s["text"] for s in spans] == ["A1", "B1 B2"]


def test_extract_pdf_spans_never_fails_stage(spark):
    from fetch_engines_spark.pdf import extract_pdf_spans

    pdfs = spark.read.parquet(os.path.join(FIXTURES, "pdfs.parquet"))
    out = extract_pdf_spans(pdfs).collect()
    assert len(out) == 7
    errs = {r.doc_id: r.error for r in out}
    assert errs["p6"] and errs["p6"].startswith("ERR_PDF")
    assert errs["p0"] is None
    ok = {r.doc_id: r for r in out if r.error is None}
    assert [s["kind"] for s in ok["p0"].spans][0] == "heading"


def test_hex_strings_decode():
    import scripts.build_fixture_data as bfd

    stream = b"BT /F1 11 Tf 72 700 Td <48656C6C 6F20 686 578> Tj ET"
    spans, _, _ = parse_pdf_spans(bfd._pdf_bytes([stream]))
    # "Hello hex" with the odd trailing nibble padded per the PDF spec
    assert spans[0]["text"] == "Hello hex"
