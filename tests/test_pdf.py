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
    assert len(out) == 9
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


def test_page_tree_order_beats_object_order():
    """Pages must extract in page-tree (logical) order even when the file's
    physical object order is scrambled — every permutation of the same
    document yields identical spans."""
    import itertools

    import scripts.build_fixture_data as bfd

    s_a = bfd._pdf_line(11, 72, 700, "alpha page")
    s_b = bfd._pdf_line(11, 72, 700, "beta page")
    baseline = None
    # ids: 1 catalog, 2 pages, 3 page1, 4 content1, 5 page2, 6 content2, 7 font
    for order in itertools.islice(itertools.permutations(range(7)), 0, 120, 7):
        pdf = bfd._pdf_bytes([s_a, s_b], order=list(order))
        spans, n_pages, _ = parse_pdf_spans(pdf)
        got = [s["text"] for s in spans]
        assert got == ["alpha page", "beta page"], (order, got)
        assert n_pages == 2
        baseline = baseline or got


def test_tounicode_cmap_decodes_non_latin():
    import scripts.build_fixture_data as bfd

    pdf = bfd._pdf_bytes_unicode([[(11.0, 72.0, 700.0, "Привет мир"), (11.0, 72.0, 600.0, "Γειά σου")]])
    spans, n_pages, _ = parse_pdf_spans(pdf)
    assert [s["text"] for s in spans] == ["Привет мир", "Γειά σου"]
    assert n_pages == 1


def test_bfrange_scalar_and_array_forms():
    from fetch_engines_spark.pdf import _parse_cmap

    cmap = (
        b"begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfrange\n"
        b"<0001> <0003> <0410>\n"             # scalar increment: A..V Cyrillic
        b"<0010> <0012> [<0041> <0042> <0043>]\n"  # array form
        b"endbfrange\n"
    )
    code_len, mapping = _parse_cmap(cmap)
    assert code_len == 2
    assert mapping[1] == "А" and mapping[3] == "В"
    assert mapping[0x10] == "A" and mapping[0x12] == "C"


def test_mutated_pdfs_never_escape_error_contract():
    """Byte-level mutations of valid PDFs (truncation, splice, bit flips at
    deterministic positions) either parse or raise ValueError/zlib/parse
    errors — extract_pdf_spans converts any exception to an error row, so
    nothing here may hang or crash the interpreter."""
    import scripts.build_fixture_data as bfd

    base = bfd._pdf_bytes(
        [bfd._pdf_line(11, 72, 700, "mutation target")], compress=True
    )
    mutants = [base[:n] for n in range(0, len(base), 97)]
    mutants += [base[:100] + base[200:], base.replace(b"/Pages", b"/Pagez")]
    for step in (53, 131, 211):
        b = bytearray(base)
        for i in range(0, len(b), step):
            b[i] ^= 0x5A
        mutants.append(bytes(b))
    for m in mutants:
        try:
            spans, n_pages, _ = parse_pdf_spans(m)
            assert isinstance(spans, list)
        except Exception:
            pass  # any raise is fine; the Spark stage maps it to an error row


def test_pdf_quote_operators_and_tstar_leading():
    """Review finding: text shown with the ' and \" move-and-show
    operators was silently dropped, and T* never advanced the baseline.
    A TL-led stream using ', \", and T*+Tj must yield every line, in
    top-to-bottom order."""
    import scripts.build_fixture_data as bfd

    from fetch_engines_spark.pdf import parse_pdf_spans

    stream = (
        b"BT /F1 11 Tf 14 TL 72 720 Td (first line) Tj "
        b"(second line) ' "
        b"1 2 (third line) \" "
        b"T* (fourth line) Tj ET"
    )
    spans, n_pages, _ = parse_pdf_spans(bfd._pdf_bytes([stream]))
    texts = [s["text"] for s in spans]
    joined = " ".join(texts)
    for part in ("first line", "second line", "third line", "fourth line"):
        assert part in joined, (part, texts)
    # order: each ' / " / T* moved DOWN one leading, so top-down order holds
    flat = joined
    assert flat.index("first") < flat.index("second") < flat.index("third") < flat.index("fourth")


def test_pdf_leading_dot_reals_and_line_continuation():
    """Review findings: '.5' must tokenize as 0.5 (not 5), and a
    backslash-EOL continuation inside a literal string removes BOTH the
    backslash and the newline."""
    import scripts.build_fixture_data as bfd

    from fetch_engines_spark.pdf import parse_pdf_spans

    # two shows at y differing only by a leading-dot real: if '.5' parsed
    # as 5, the baselines differ by 5pt and the 2pt line-merge splits them
    stream = (
        b"BT /F1 11 Tf 72 700 Td (left) Tj 40 -.5 Td (right) Tj ET"
    )
    spans, _, _ = parse_pdf_spans(bfd._pdf_bytes([stream]))
    assert [s["text"] for s in spans] == ["left right"]

    cont = b"BT /F1 11 Tf 72 700 Td (long\\\nstring) Tj ET"
    spans2, _, _ = parse_pdf_spans(bfd._pdf_bytes([cont]))
    assert [s["text"] for s in spans2] == ["longstring"]


def test_pdf_encrypt_mention_in_content_is_not_rejected():
    """Review finding: the /Encrypt check scanned the WHOLE file, so a
    readable PDF whose text merely mentions /Encrypt was rejected; only
    a trailer-dictionary /Encrypt means encryption."""
    import scripts.build_fixture_data as bfd

    import pytest as _pytest

    from fetch_engines_spark.pdf import parse_pdf_spans

    stream = b"BT /F1 11 Tf 72 700 Td (see the /Encrypt dictionary) Tj ET"
    spans, _, _ = parse_pdf_spans(bfd._pdf_bytes([stream]))
    assert spans and "/Encrypt" in spans[0]["text"]

    # a REAL trailer /Encrypt still rejects
    pdf = bytearray(bfd._pdf_bytes([stream]))
    at = pdf.find(b"/Root 1 0 R")
    pdf[at:at] = b"/Encrypt 9 0 R "
    with _pytest.raises(ValueError, match="encrypted"):
        parse_pdf_spans(bytes(pdf))


def test_pdf_fallback_path_survives_endobj_inside_compressed_stream():
    """Review finding: the catalog-less fallback used a naive object
    regex that truncated compressed streams containing the bytes
    'endobj'; it now reuses the stream-aware scan."""
    import zlib as _z

    import scripts.build_fixture_data as bfd

    from fetch_engines_spark.pdf import parse_pdf_spans

    # level-0 deflate emits STORED blocks, so plaintext containing
    # 'endobj' appears verbatim in the compressed bytes
    stream = b"BT /F1 11 Tf 72 700 Td (fallback text) Tj ET % endobj bait"
    data = _z.compress(stream, 0)
    assert b"endobj" in data
    # object soup WITHOUT a catalog: one content-stream object only
    obj = b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (len(data), data)
    pdf = bfd._assemble_pdf([obj])
    spans, n_pages, _ = parse_pdf_spans(pdf)
    assert [s["text"] for s in spans] == ["fallback text"]
