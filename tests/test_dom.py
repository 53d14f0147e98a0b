"""Unit tests for the stdlib DOM + selector engine."""

from fetch_engines_spark.dom import parse_html


def test_parse_and_text_content_preserves_whitespace():
    root = parse_html("<div>\n  <p>hello</p>\n</div>")
    assert root.text_content == "\n  hello\n"


def test_query_selector_tag_class_id():
    root = parse_html(
        '<div id="a" class="x y"><span class="x">1</span></div><p class="x-z">2</p>'
    )
    assert len(root.query_selector_all(".x")) == 2
    assert root.query_selector("#a").tag == "div"
    assert root.query_selector("p.x-z").text_content == "2"
    # class token must match exactly, not substring
    assert root.query_selector_all(".x")[0].get_attribute("id") == "a"


def test_attr_selectors():
    root = parse_html(
        '<img src="data:image/svg+xml;base64,x"><img src="/a.png">'
        '<input type="button"><input type="text">'
        '<div id="cookie-banner-2">c</div>'
    )
    assert len(root.query_selector_all("img[src*='data:image/svg']")) == 1
    assert len(root.query_selector_all("input[type='button']")) == 1
    assert len(root.query_selector_all("[id*='cookie-banner']")) == 1


def test_not_selector():
    root = parse_html('<iframe title="embed"></iframe><iframe src="x"></iframe>')
    matches = root.query_selector_all("iframe:not([title])")
    assert len(matches) == 1
    assert matches[0].get_attribute("src") == "x"


def test_prefix_attr_selector():
    root = parse_html('<div id="comment-12">a</div><div id="c_9">b</div><div id="x">c</div>')
    assert len(root.query_selector_all("[id^='comment-']")) == 1
    assert len(root.query_selector_all("div[id^='c_']")) == 1


def test_closest_and_remove():
    root = parse_html("<main><section><a href='/x'>l</a></section></main>")
    a = root.query_selector("a")
    assert a.closest("main").tag == "main"
    assert a.closest("a") is a
    section = root.query_selector("section")
    section.remove()
    assert root.query_selector("a") is None


def test_clone_is_deep_and_detached():
    root = parse_html("<div><p>x</p></div>")
    div = root.query_selector("div")
    c = div.clone()
    assert c.parent is None
    c.query_selector("p").remove()
    assert div.query_selector("p") is not None


def test_void_elements_and_entities():
    root = parse_html("<p>a &amp; b<br>c</p><img src='i.png'>")
    p = root.query_selector("p")
    assert p.text_content == "a & b" + "c"
    assert root.query_selector("img") is not None


def test_implicit_close_li_and_p():
    root = parse_html("<ul><li>one<li>two</ul><p>x<p>y")
    lis = root.query_selector_all("li")
    assert [li.text_content for li in lis] == ["one", "two"]
    assert len(root.query_selector_all("p")) == 2


def test_selector_list_commas():
    root = parse_html("<script>x</script><style>y</style><div>z</div>")
    matches = root.query_selector_all("script, style")
    assert {m.tag for m in matches} == {"script", "style"}


def test_to_html_roundtrip():
    html = '<div class="a"><p>text &amp; more</p><img src="x.png"></div>'
    root = parse_html(html)
    out = root.to_html()
    reparsed = parse_html(out)
    assert reparsed.query_selector("p").text_content == "text & more"
    assert reparsed.query_selector("img").get_attribute("src") == "x.png"


def _merge_text(children):
    from fetch_engines_spark.dom import TextNode

    out = []
    for c in children:
        if isinstance(c, TextNode) and out and isinstance(out[-1], TextNode):
            out[-1] = TextNode(out[-1].text + c.text)
        else:
            out.append(c)
    return out


def _tree_diff(a, b, path="root"):
    from fetch_engines_spark.dom import TextNode

    ca, cb = _merge_text(a.children), _merge_text(b.children)
    if len(ca) != len(cb):
        return f"{path}: child count {len(ca)} vs {len(cb)}"
    for i, (x, y) in enumerate(zip(ca, cb)):
        tx, ty = isinstance(x, TextNode), isinstance(y, TextNode)
        if tx != ty:
            return f"{path}[{i}]: node type"
        if tx:
            if x.text != y.text:
                return f"{path}[{i}]: text {x.text[:40]!r} != {y.text[:40]!r}"
        else:
            if x.tag != y.tag or x.attrs != y.attrs:
                return f"{path}[{i}]: {x.tag} {x.attrs} != {y.tag} {y.attrs}"
            d = _tree_diff(x, y, f"{path}/{x.tag}")
            if d:
                return d
    return None


def test_fast_parser_matches_stdlib_on_fixtures():
    from fetch_engines_spark.dom import parse_html_fast, parse_html_stdlib
    from fetch_engines_spark.fixtures import FIXTURES

    for f in FIXTURES:
        d = _tree_diff(parse_html_fast(f.html), parse_html_stdlib(f.html))
        assert d is None, (f.id, d)


def test_fast_parser_matches_stdlib_fuzz():
    import string

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fetch_engines_spark.dom import parse_html_fast, parse_html_stdlib

    tags = ["div", "p", "a", "span", "script", "style", "img", "ul", "li", "br", "table", "tr", "td"]
    frag = st.recursive(
        st.text(string.ascii_letters + " &amp; &lt; #x27; \n\t", max_size=40),
        lambda inner: st.builds(
            lambda t, a, i, closed: f"<{t}{a}>{i}" + (f"</{t}>" if closed else ""),
            st.sampled_from(tags),
            st.sampled_from(["", " class='a b'", ' id="x"', " data-v='1' hidden", " href=/x"]),
            inner,
            st.booleans(),
        ),
        max_leaves=8,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(frag, max_size=5).map("".join))
    def check(html):
        d = _tree_diff(parse_html_fast(html), parse_html_stdlib(html))
        assert d is None, (html[:120], d)

    check()
