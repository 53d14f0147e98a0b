"""Property-based robustness tests (hypothesis): the converter must never
throw on arbitrary input, and span segmentation must round-trip."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from fetch_engines_spark.convert.converter import MarkdownConverter, postprocess_markdown
from fetch_engines_spark.dom import parse_html
from fetch_engines_spark.extract import markdown_to_spans, spans_to_markdown

conv = MarkdownConverter()

TAGS = ["div", "p", "a", "span", "main", "nav", "ul", "li", "table", "tr", "td",
        "h1", "h2", "script", "style", "img", "button", "pre", "code", "strong"]

text_strategy = st.text(
    alphabet=string.ascii_letters + string.digits + " <>&\"'=/.\n\t{}|[]()#*-_`",
    max_size=200,
)


@st.composite
def html_fragments(draw, depth=0):
    if depth > 4:
        return draw(text_strategy)
    n = draw(st.integers(0, 3))
    parts = []
    for _ in range(n):
        if draw(st.booleans()):
            tag = draw(st.sampled_from(TAGS))
            attrs = ""
            if draw(st.booleans()):
                attrs = f' class="{draw(st.text(string.ascii_lowercase + "- ", max_size=20))}"'
            if draw(st.booleans()):
                attrs += f' href="{draw(st.text(string.ascii_letters + ":/.-", max_size=30))}"'
            inner = draw(html_fragments(depth=depth + 1))
            if draw(st.integers(0, 9)) == 0:
                parts.append(f"<{tag}{attrs}>{inner}")  # unclosed
            else:
                parts.append(f"<{tag}{attrs}>{inner}</{tag}>")
        else:
            parts.append(draw(text_strategy))
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(html_fragments())
def test_convert_never_raises(html):
    md = conv.convert(html, base_url="https://example.com/a/b")
    assert isinstance(md, str)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_convert_raw_text_never_raises(text):
    assert isinstance(conv.convert(text), str)


@settings(max_examples=150, deadline=None)
@given(html_fragments())
def test_parse_never_raises(html):
    root = parse_html(html)
    assert root.text_content is not None


@settings(max_examples=200, deadline=None)
@given(html_fragments())
def test_span_roundtrip_from_any_page(html):
    """spans → markdown reconstruction must be lossless for any produced
    markdown, and offsets dense."""
    md = conv.convert(html)
    spans = markdown_to_spans(md)
    assert spans_to_markdown(spans) == md
    assert [s["offset"] for s in spans] == list(range(len(spans)))


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_postprocess_idempotent_on_its_own_output(md):
    once = postprocess_markdown(md)
    assert isinstance(once, str)


def test_deeply_nested_html_does_not_crash():
    html = "<div>" * 3000 + "deep content here" + "</div>" * 3000
    md = conv.convert(html)
    assert isinstance(md, str)


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _dup_corpus(draw):
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    n_base = draw(st.integers(2, 5))
    docs = []
    for i in range(n_base):
        toks = draw(st.lists(st.sampled_from(words), min_size=6, max_size=18))
        docs.append((f"d{i:02d}", " ".join(toks)))
    # replicate one doc a draw-chosen number of times (the degenerate bucket)
    n_rep = draw(st.integers(0, 6))
    docs += [(f"r{j:02d}", docs[0][1]) for j in range(n_rep)]
    return docs


@given(_dup_corpus(), st.integers(2, 4))
@settings(max_examples=8, deadline=None)
def test_capped_pairs_are_subset_of_uncapped(spark, corpus, cap):
    """Invariants of the skew guard, for any corpus and cap: (1) capped
    candidate pairs never invent a pair the uncapped join wouldn't emit;
    (2) every pair of byte-identical texts is still recovered (via star or
    pairwise) as a connected component."""
    from pyspark.sql import functions as F

    from fetch_engines_spark.pipelines.dedup import minhash_candidate_pairs

    pass  # spark is the session fixture
    df = spark.createDataFrame(corpus, "doc_id string, text string")
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(df, num_hashes=4, band_size=2).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in minhash_candidate_pairs(
            df, num_hashes=4, band_size=2, max_bucket_size=cap
        ).collect()
    }
    assert capped <= uncapped

    # identical-text docs stay connected through the group representative
    from collections import defaultdict

    groups = defaultdict(list)
    for doc_id, text in corpus:
        groups[text].append(doc_id)
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in capped:
        parent[find(a)] = find(b)
    for text, ids in groups.items():
        if len(ids) > 1:
            roots = {find(i) for i in ids}
            assert len(roots) == 1, (text, ids, capped)


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=120, deadline=None)
def test_pdf_parser_never_crashes_unexpectedly(data):
    """Fuzz: arbitrary bytes either parse or raise ValueError/zlib-style
    errors wrapped by the stage — never an unbounded crash type that the
    UDF's except would miss."""
    from fetch_engines_spark.pdf import parse_pdf_spans

    try:
        spans, n_pages, n_items = parse_pdf_spans(b"%PDF-1.4\n" + data)
        assert isinstance(spans, list) and n_pages >= 0 and n_items >= 0
    except Exception:
        pass  # the Arrow stage catches per-doc exceptions into the error column


@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=1,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=40, deadline=None)
def test_pdf_writer_parser_roundtrip_arbitrary_text(lines):
    """Generator→parser roundtrip for arbitrary printable text (incl.
    parens/backslashes, which exercise the escape paths)."""
    import scripts.build_fixture_data as bfd
    from fetch_engines_spark.pdf import parse_pdf_spans

    stream = b"\n".join(
        bfd._pdf_line(11, 72, 720 - 100 * i, t) for i, t in enumerate(lines)
    )
    spans, n_pages, _ = parse_pdf_spans(bfd._pdf_bytes([stream]))
    got = [s["text"] for s in spans]
    # each input line is its own span (100pt gaps defeat paragraph merging);
    # the parser strips leading/trailing whitespace and drops blank lines
    exp = [t.strip() for t in lines if t.strip()]
    assert got == exp, (got, lines)


@given(
    st.integers(1, 12),
    st.integers(1, 10),
    st.sampled_from([0, 2, 4, 6]),
    st.lists(st.integers(0, 4), min_size=1, max_size=5),
    st.integers(0, 2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_writer_decoder_roundtrip_arbitrary(w, h, color_type, filters, seed):
    """PNG property: any dimensions/color type/per-row filter mix written
    by the generator decodes to the exact pixel array."""
    from scripts.build_fixture_data import _png_bytes

    from fetch_engines_spark.pipelines.multimodal import decode_png

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    px = bytes((seed * 2654435761 + i * 97) % 256 for i in range(w * h * ch))
    img = decode_png(_png_bytes(w, h, color_type, px, filters))
    assert img["pixels"] == px and (img["width"], img["height"]) == (w, h)


@given(
    st.integers(1, 24),
    st.integers(1, 12),
    st.integers(2, 64),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_gif_writer_decoder_roundtrip_arbitrary(w, h, ncolors, seed):
    """GIF property: any dimensions/palette size decode to the exact RGB
    array (exercising LZW dictionary growth and width boundaries)."""
    from scripts.build_fixture_data import _gif_bytes

    from fetch_engines_spark.pipelines.multimodal import decode_gif

    palette = [((i * 37 + seed) % 256, (i * 91) % 256, (i * 53) % 256) for i in range(ncolors)]
    idx = bytes((seed + i * 31) % ncolors for i in range(w * h))
    img = decode_gif(_gif_bytes(w, h, palette, idx, with_extension=bool(seed % 2)))
    assert img["pixels"] == b"".join(bytes(palette[i]) for i in idx)


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64), st.integers(1, 2))
@settings(max_examples=40, deadline=None)
def test_wav_writer_decoder_roundtrip_arbitrary(samples, channels):
    from scripts.build_fixture_data import _wav_bytes

    from fetch_engines_spark.pipelines.multimodal import decode_wav

    w = decode_wav(_wav_bytes(8000, channels, samples, extra_chunk=len(samples) % 2 == 0))
    assert w["samples"] == samples and w["channels"] == channels


@given(
    st.integers(1, 3),
    st.integers(1, 3),
    st.integers(0, 5),
    st.sampled_from([1, 3]),
    st.integers(0, 2),
    st.sampled_from([None, (2, 2), (2, 1), (1, 2)]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_writer_decoder_roundtrip_arbitrary(bw, bh, crop, nc, dri, ysamp, seed):
    """JPEG property: arbitrary quantized coefficients (random sparsity →
    every DC category, AC run/size, ZRL, EOB path), varied quant tables,
    gray + YCbCr, non-multiple-of-8 crops, restart intervals, and chroma
    subsampling (4:2:0 / 4:2:2 / 4:4:0) decode to exactly the spec-IDCT
    expected pixels."""
    from scripts.build_fixture_data import _jpeg_bytes, _jpeg_expected_pixels

    from fetch_engines_spark.pipelines.multimodal import decode_jpeg

    sampling = None
    if nc == 3 and ysamp is not None:
        sampling = [ysamp, (1, 1), (1, 1)]
    hmax = sampling[0][0] if sampling else 1
    vmax = sampling[0][1] if sampling else 1
    # dims measured in MCUs so every sampling layout stays block-aligned
    # to the grid; crop still exercises non-multiple-of-8 edges
    w, h = bw * 8 * hmax - crop, bh * 8 * vmax - (crop % 3)
    qts = [
        [1 + (seed + ci * 7 + i) % 5 for i in range(64)] for ci in range(nc)
    ]
    comps = []
    for ci in range(nc):
        hs, vs = (sampling[ci] if sampling else (1, 1))
        n_blocks = (bw * hs) * (bh * vs)
        blocks = []
        for b in range(n_blocks):
            blk = [0] * 64
            blk[0] = ((seed >> 3) + b * 37 + ci * 101) % 1024 - 512
            for j in range((seed + b) % 4):
                pos = (seed // 5 + 13 * j + b * 29) % 63 + 1
                blk[pos] = ((seed >> (j + 2)) % 64) - 32
            blocks.append(blk)
        comps.append(blocks)
    payload = _jpeg_bytes(w, h, comps, qts, dri=dri, sampling=sampling)
    img = decode_jpeg(payload)
    assert (img["width"], img["height"], img["channels"]) == (w, h, nc)
    assert img["pixels"] == _jpeg_expected_pixels(w, h, comps, qts, sampling=sampling)


@given(
    st.binary(min_size=0, max_size=300),
    st.sampled_from([b"\x89PNG\r\n\x1a\n", b"GIF89a", b"RIFF", b"\xff\xd8\xff\xe0"]),
)
@settings(max_examples=150, deadline=None)
def test_media_decoders_never_crash_unexpectedly(data, sig):
    """Fuzz: arbitrary bytes behind each magic either decode or raise —
    the Arrow stages convert any raise to an error row; nothing may hang
    or exhaust memory (bomb guards bound all allocations)."""
    from fetch_engines_spark.pipelines.multimodal import (
        decode_gif,
        decode_jpeg,
        decode_png,
        decode_wav,
    )

    fn = {
        b"\x89PNG\r\n\x1a\n": decode_png,
        b"GIF89a": decode_gif,
        b"RIFF": decode_wav,
        b"\xff\xd8\xff\xe0": decode_jpeg,
    }[sig]
    try:
        fn(sig + data)
    except Exception:
        pass


@given(
    st.integers(1, 3),
    st.integers(1, 2),
    st.integers(0, 5),
    st.sampled_from([1, 3]),
    st.integers(0, 2),
    st.sampled_from([None, (2, 2), (2, 1)]),
    st.sampled_from([(0, 0), (1, 1), (2, 1)]),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_jpeg_progressive_roundtrip_arbitrary(bw, bh, crop, nc, dri, ysamp, approx, seed):
    """Progressive-JPEG property: the same arbitrary quantized
    coefficients as the baseline roundtrip, re-encoded as SOF2 scan
    scripts — spectral selection, EOBn runs, DC/AC successive
    approximation at (al_luma, al_chroma) levels, refinement correction
    bits (incl. eager-ZRL splits), interleaved DC + per-component AC,
    restart intervals — must decode to exactly the same spec-IDCT
    pixels (progressive coding is lossless over the coefficients)."""
    from scripts.build_fixture_data import (
        _jpeg_bytes_progressive,
        _jpeg_expected_pixels,
    )

    from fetch_engines_spark.pipelines.multimodal import decode_jpeg

    sampling = None
    if nc == 3 and ysamp is not None:
        sampling = [ysamp, (1, 1), (1, 1)]
    hmax = sampling[0][0] if sampling else 1
    vmax = sampling[0][1] if sampling else 1
    w, h = bw * 8 * hmax - crop, bh * 8 * vmax - (crop % 3)
    qts = [
        [1 + (seed + ci * 7 + i) % 5 for i in range(64)] for ci in range(nc)
    ]
    comps = []
    for ci in range(nc):
        hs, vs = (sampling[ci] if sampling else (1, 1))
        n_blocks = (bw * hs) * (bh * vs)
        blocks = []
        for b in range(n_blocks):
            blk = [0] * 64
            blk[0] = ((seed >> 3) + b * 37 + ci * 101) % 1024 - 512
            for j in range((seed + b) % 4):
                pos = (seed // 5 + 13 * j + b * 29) % 63 + 1
                blk[pos] = ((seed >> (j + 2)) % 64) - 32
            blocks.append(blk)
        comps.append(blocks)
    al_y, al_c = approx
    allc = list(range(nc))
    scans = [(allc, 0, 0, 0, al_y)]
    for ci in range(nc):
        al0 = al_y if ci == 0 else al_c
        scans.append(([ci], 1, 5, 0, al0))
        scans.append(([ci], 6, 63, 0, al0))
    for lvl in range(al_y, 0, -1):
        scans.append((allc, 0, 0, lvl, lvl - 1))
    for ci in range(nc):
        al0 = al_y if ci == 0 else al_c
        for lvl in range(al0, 0, -1):
            scans.append(([ci], 1, 5, lvl, lvl - 1))
            scans.append(([ci], 6, 63, lvl, lvl - 1))
    payload = _jpeg_bytes_progressive(
        w, h, comps, qts, scans, sampling=sampling, dri=dri
    )
    img = decode_jpeg(payload)
    assert (img["width"], img["height"], img["channels"]) == (w, h, nc)
    assert img["pixels"] == _jpeg_expected_pixels(w, h, comps, qts, sampling=sampling)


@given(
    st.integers(1, 20),
    st.integers(1, 20),
    st.sampled_from([0, 2, 6]),
    st.lists(st.integers(0, 4), min_size=1, max_size=5),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_png_adam7_roundtrip_arbitrary(w, h, ct, filters, seed):
    """Adam7 property: arbitrary (incl. tiny/ragged) dimensions, every
    color type and filter mix, encoded interlaced, must decode to the
    EXACT display-order pixels — pixel equality (not just sums) catches
    any pass-order or scatter-position mistake."""
    from scripts.build_fixture_data import _png_bytes

    from fetch_engines_spark.pipelines.multimodal import decode_png

    ch = {0: 1, 2: 3, 6: 4}[ct]
    px = bytes(((x * 7 + y * 13 + c * 29 + seed) % 256)
               for y in range(h) for x in range(w) for c in range(ch))
    img = decode_png(_png_bytes(w, h, ct, px, filters, interlaced=True))
    assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
    assert img["pixels"] == px
    # and the same pixels non-interlaced agree
    img2 = decode_png(_png_bytes(w, h, ct, px, filters))
    assert img2["pixels"] == px


@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(2, 16),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_gif_interlaced_roundtrip_arbitrary(w, h, ncolors, seed):
    """GIF interlace property: rows stored in 4-pass order must
    de-interlace to the exact display-order pixels at any height
    (heights < 8 leave early passes ragged or empty)."""
    from scripts.build_fixture_data import _gif_bytes

    from fetch_engines_spark.pipelines.multimodal import decode_gif

    palette = [((i * 37 + seed) % 256, (i * 91) % 256, (i * 53) % 256) for i in range(ncolors)]
    idx = bytes((seed + x * 3 + y * 17) % ncolors for y in range(h) for x in range(w))
    img = decode_gif(_gif_bytes(w, h, palette, idx, interlaced=True))
    assert img["pixels"] == b"".join(bytes(palette[i]) for i in idx)


@given(
    st.integers(4, 16),
    st.integers(4, 16),
    st.integers(1, 4),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_gif_animation_roundtrip_arbitrary(sw, sh, n_frames, seed):
    """Animation property: arbitrary frame rects, disposal methods,
    transparency, and interlacing must composite to exactly the
    generator's independent plain-Python canvases."""
    import random

    from scripts.build_fixture_data import _gif_anim_bytes, _gif_anim_expected

    from fetch_engines_spark.pipelines.multimodal import decode_gif_frames

    rng = random.Random(seed)
    pal = [((i * 37 + seed) % 256, (i * 91) % 256, (i * 53) % 256) for i in range(8)]
    frames = []
    for _ in range(n_frames):
        w = rng.randint(1, sw)
        h = rng.randint(1, sh)
        fr = {
            "x": rng.randint(0, sw - w),
            "y": rng.randint(0, sh - h),
            "w": w,
            "h": h,
            "indices": bytes(rng.randrange(8) for _ in range(w * h)),
            "disposal": rng.choice([0, 0, 1, 2, 3]),
            "interlaced": rng.random() < 0.3,
        }
        if rng.random() < 0.5:
            fr["transparent"] = rng.randrange(8)
        frames.append(fr)
    payload = _gif_anim_bytes(sw, sh, pal, frames, bg_idx=rng.randrange(8))
    # bg_idx must match between writer and expected-composer
    # (re-extract it from the payload header)
    bg_idx = payload[11]
    got = decode_gif_frames(payload)
    exp = _gif_anim_expected(sw, sh, pal, frames, bg_idx=bg_idx)
    assert got["n_frames"] == len(frames)
    assert got["frames"] == exp


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["response", "request", "warcinfo", "metadata"]),
            st.binary(min_size=0, max_size=200),
            st.booleans(),
        ),
        min_size=1,
        max_size=6,
    ),
    st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_warc_writer_parser_roundtrip_arbitrary(specs, gzipped):
    """WARC property: arbitrary record mixes (incl. HTTP-response blocks
    and bodies containing CRLF/WARC-like bytes) roundtrip through the
    independent writer, plain or as per-record gzip members."""
    import gzip as _gz

    import scripts.build_fixture_data as bfd

    from fetch_engines_spark.warc import parse_warc

    raws = []
    expected = []
    for i, (wtype, body, as_http) in enumerate(specs):
        rid = f"<urn:uuid:prop-{i}>"
        if wtype == "response" and as_http:
            block = bfd._http_response("200 OK", "application/octet-stream", body)
            exp_payload, exp_status = body, 200
        else:
            block = body
            exp_payload, exp_status = body, None
        raws.append(
            bfd._warc_record(
                wtype, rid, {"WARC-Target-URI": f"https://x.test/{i}"}, block
            )
        )
        expected.append((rid, wtype, exp_status, exp_payload))
    data = (
        b"".join(_gz.compress(r) for r in raws) if gzipped else b"".join(raws)
    )
    recs = parse_warc(data)
    assert [
        (r["record_id"], r["warc_type"], r["http_status"], r["payload"]) for r in recs
    ] == expected


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=120, deadline=None)
def test_warc_parser_never_crashes_unexpectedly(data):
    """Fuzz: arbitrary bytes (optionally behind the WARC magic) either
    parse or raise ValueError — the Arrow stage's error-row contract."""
    from fetch_engines_spark.warc import parse_warc

    for payload in (data, b"WARC/1.0\r\n" + data):
        try:
            parse_warc(payload)
        except ValueError:
            pass


def test_warc_parser_review_findings():
    """Review findings on the WARC parser: folded (continuation) header
    lines are legal WARC 1.0 and must parse; a missing WARC-Record-ID
    yields None (not ""), so the documents adapter's url fallback fires;
    partial=True bounds a malformed record's blast radius to the tail;
    NUL padding after the last gzip member is tolerated but other
    trailing garbage is not."""
    import gzip as _gz

    import scripts.build_fixture_data as bfd

    from fetch_engines_spark.warc import parse_warc

    # folded WARC header: the long URI continues on an HT-indented line
    folded = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Record-ID: <urn:uuid:fold-1>\r\n"
        b"WARC-Target-URI: https://example.test/a-very\r\n"
        b"\t/long/path\r\n"
        b"Content-Length: 4\r\n\r\nBODY\r\n\r\n"
    )
    (rec,) = parse_warc(folded)
    assert rec["target_uri"] == "https://example.test/a-very /long/path"
    assert rec["payload"] == b"BODY"

    # record without WARC-Record-ID -> None, never ""
    no_id = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: https://example.test/x\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    (rec,) = parse_warc(no_id)
    assert rec["record_id"] is None

    # partial mode: 2 good records then garbage -> both records + sentinel
    good = bfd._warc_record("resource", "<urn:uuid:p-0>", {}, b"one")
    good2 = bfd._warc_record("resource", "<urn:uuid:p-1>", {}, b"two")
    broken = good + good2 + b"WARC/1.0\r\nNo-Colon-Header\r\n\r\n"
    out = parse_warc(broken, partial=True)
    assert [r.get("record_id") for r in out[:2]] == ["<urn:uuid:p-0>", "<urn:uuid:p-1>"]
    assert "_partial_error" in out[2] and "after 2 parsed records" in out[2]["_partial_error"]
    # without partial the same input raises (API contract unchanged)
    try:
        parse_warc(broken)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # a file that is garbage from byte 0 still raises even with partial
    try:
        parse_warc(b"WARC/1.0\r\nNo-Colon\r\n\r\n", partial=True)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

    # gzip members: NUL padding after the last member tolerated,
    # non-NUL trailing garbage rejected (offset-walk regression)
    members = b"".join(_gz.compress(r) for r in (good, good2))
    recs = parse_warc(members + b"\x00" * 16)
    assert [r["record_id"] for r in recs] == ["<urn:uuid:p-0>", "<urn:uuid:p-1>"]
    try:
        parse_warc(members + b"junk")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_gunzip_members_many_members_linear_walk():
    """~2000 per-record gzip members must decompress via the offset walk
    (the old tail-reslice-per-member pattern was quadratic; at this size
    it still finishes but the walk must stay byte-exact across member
    boundaries, including members that end exactly on a chunk edge)."""
    import gzip as _gz

    from fetch_engines_spark.warc import _gunzip_members

    parts = [f"rec-{i}|".encode() * (i % 7 + 1) for i in range(2000)]
    blob = b"".join(_gz.compress(p) for p in parts)
    assert _gunzip_members(blob, 1 << 26) == b"".join(parts)
