"""Golden-behavior tests for the extraction converter.

Mirrors the reference's MarkdownConverter suite (reference:
test/MarkdownConverter.test.ts) — containment assertions over the produced
Markdown for each fixture page (SURVEY.md §5 layer 1).
"""

import pytest

from fetch_engines_spark.convert import MarkdownConverter, inject_source_url
from fetch_engines_spark.fixtures import EXTRACTION_FIXTURE_IDS, FIXTURES_BY_ID


@pytest.fixture(scope="module")
def converter():
    return MarkdownConverter()


@pytest.mark.parametrize("fid", EXTRACTION_FIXTURE_IDS)
def test_fixture_containment(converter, fid):
    f = FIXTURES_BY_ID[fid]
    md = converter.convert(f.html, base_url=f.base_url)
    for expected in f.must_contain:
        assert expected in md, f"{fid}: missing {expected!r}\n---\n{md}"
    for banned in f.must_not_contain:
        assert banned not in md, f"{fid}: unexpected {banned!r}\n---\n{md}"


def test_gfm_table_first_row_promoted(converter):
    md = converter.convert(FIXTURES_BY_ID["F01"].html)
    lines = [ln for ln in md.split("\n") if ln.startswith("|")]
    assert lines[0].startswith("| **Position** |")
    assert set(lines[1].replace("|", "").split()) == {"---"}


def test_title_injected_as_h1_when_missing(converter):
    html = (
        "<html><head><title>Doc Title</title></head>"
        "<body><main><p>Body content long enough to be selected as the main "
        "content of this page, including several descriptive words.</p></main></body></html>"
    )
    md = converter.convert(html)
    assert md.startswith("# Doc Title")


def test_h1_replaced_by_longer_containing_title(converter):
    html = (
        "<html><head><title>Short | Full Site Name And More</title></head>"
        "<body><main><h1>Short</h1><p>Body content long enough to be selected as "
        "main content for this fixture page with words.</p></main></body></html>"
    )
    md = converter.convert(html)
    assert "# Short | Full Site Name And More" in md


def test_first_heading_promoted_when_no_title(converter):
    md = converter.convert(FIXTURES_BY_ID["F07"].html, base_url="https://example.com/")
    assert "# Recent News" in md


def test_max_content_length_truncation(converter):
    html = "<body><main><p>" + ("Sentence one. " * 200) + "</p></main></body>"
    md = converter.convert(html, max_content_length=300)
    assert md.endswith("... (truncated)")
    assert len(md) <= 300 + len("... (truncated)")


def test_inject_source_url_after_first_h1():
    md = "# Title\n\nBody text."
    out = inject_source_url(md, "https://example.com/page")
    assert out.split("\n")[0] == "# Title"
    assert "Source: https://example.com/page" in out
    # idempotent
    assert inject_source_url(out, "https://example.com/page") == out


def test_preprocess_failure_falls_back_to_cleaned_html(converter, monkeypatch):
    import fetch_engines_spark.convert.converter as mod

    def boom(html):
        raise RuntimeError("injected")

    monkeypatch.setattr(mod, "parse_html", boom)
    out, title = converter.preprocess("<p>hello {{var}} world</p>")
    assert isinstance(out, str)
    assert "{{var}}" not in out and "hello" in out
    assert title == ""


def test_template_vars_and_control_chars_scrubbed(converter):
    html = "<body><main><p>keep {{tmpl}} this\x07 text plus enough words to be the selected main content.</p></main></body>"
    md = converter.convert(html)
    assert "{{tmpl}}" not in md
    assert "\x07" not in md
    assert "keep" in md


def test_forum_branch_assembles_post_and_comments(converter):
    html = """
    <body>
      <header><a href='/'>site chrome</a></header>
      <div class="fatitem"><p>The original submission text of this thread post.</p></div>
      <div class="comment-tree">
        <div class="comment"><p>First comment body.</p></div>
        <div class="comment"><p>Second comment body.</p></div>
        <div class="comment"><p>Third comment body.</p></div>
        <div class="sidebar"><a href='/x'>sidebar junk</a></div>
      </div>
    </body>"""
    md = converter.convert(html)
    assert "The original submission text" in md
    assert "First comment body." in md
    assert "sidebar junk" not in md
    assert "site chrome" not in md


def test_svg_image_refs_removed(converter):
    html = (
        "<body><main><h1>T</h1><img src='/logo.SVG' alt='logo'><img src='/photo.png' alt='photo'>"
        "<p>Enough body text for content selection to keep this main element.</p></main></body>"
    )
    md = converter.convert(html)
    assert "logo" not in md
    assert "photo.png" in md


def test_breadcrumbs_removed(converter):
    html = (
        "<body><main><nav aria-label='breadcrumb'><a href='/'>Home</a> &gt; "
        "<a href='/c'>Category</a></nav><h1>Article</h1>"
        "<p>Enough text to keep this main element selected as content.</p></main></body>"
    )
    md = converter.convert(html)
    assert "Home" not in md
    assert "Article" in md


def test_serializer_edge_blocks(converter):
    """Pin additional serializer behaviors: thead tables, nested lists,
    blockquote, hr, definition lists, inline code in headings."""
    html = """
    <body><main>
      <h1>Edge <code>cases</code></h1>
      <table><thead><tr><th>A</th><th>B</th></tr></thead>
        <tbody><tr><td>1</td><td>2</td></tr></tbody></table>
      <ul><li>top<ul><li>nested one</li><li>nested two</li></ul></li><li>second</li></ul>
      <blockquote><p>quoted wisdom</p></blockquote>
      <hr>
      <dl><dt>Term</dt><dd>Definition text</dd></dl>
      <p>after the rule with plenty of supporting words to stay selected here</p>
    </main></body>"""
    md = converter.convert(html)
    assert "# Edge `cases`" in md
    assert "| A | B |" in md and "| 1 | 2 |" in md
    # M9 (reference postprocess step 6) trims leading spaces per line, so
    # nested-list indentation flattens — faithful to the reference's own
    # postprocessMarkdown (markdown-converter.ts:933)
    assert "- top" in md and "- nested one" in md
    assert "> quoted wisdom" in md
    assert "\n---\n" in md
    assert "Term" in md and "Definition text" in md


def test_ordered_list_numbering(converter):
    html = ("<body><main><h1>Steps</h1><ol><li>first step</li><li>second step</li>"
            "<li>third step</li></ol><p>closing text to keep main selected with more words</p></main></body>")
    md = converter.convert(html)
    assert "1. first step" in md and "2. second step" in md and "3. third step" in md


def test_strikethrough_and_em(converter):
    html = ("<body><main><h1>Styles</h1><p>Some <em>emphasis</em> and <s>struck</s> and "
            "<strong>bold</strong> text in a paragraph long enough to be chosen as content.</p></main></body>")
    md = converter.convert(html)
    assert "*emphasis*" in md and "~~struck~~" in md and "**bold**" in md


def test_linked_image_stays_inline(converter):
    html = ("<body><main><h1>Pic</h1><p><a href='/big.png'><img src='/thumb.png' alt='thumb'></a>"
            " caption words and enough additional text for the content selection to hold.</p></main></body>")
    md = converter.convert(html)
    assert "[![thumb](/thumb.png)](/big.png)" in md


def test_forum_detection_via_og_url(converter):
    """Forum host detection falls back to og:url when no canonical link
    (parity: detectForumPage, markdown-converter.ts:662-676)."""
    html = (
        "<html><head><meta property='og:url' content='https://community.example.com/t/1'>"
        "</head><body><div class='post'><p>Single post body long enough to be the content here.</p>"
        "</div></body></html>"
    )
    content, _ = converter.preprocess(html)
    # forum branch selected: no .fatitem/.comments → falls back to cleaned body
    md = converter.convert(html)
    assert "Single post body" in md


def test_relative_canonical_resolved_against_dummy_base(converter):
    """Relative canonical URLs resolve against http://example.com (parity:
    markdown-converter.ts:666-668) — no crash, no forum detection."""
    html = (
        "<html><head><link rel='canonical' href='/article/42'></head>"
        "<body><main><h1>T</h1><p>Body content with enough words to be selected as main.</p></main></body></html>"
    )
    md = converter.convert(html)
    assert "Body content" in md
