"""Native-column classifiers (no UDF): the reference's X-family.

Every function here returns a pyspark ``Column`` built from
``regexp_replace`` / ``rlike`` / ``length`` / ``least`` / ``floor`` so the
whole family stays inside whole-stage codegen (SURVEY.md §2.5 — these are
"fully native, no UDF needed").

Parity sources (reference files):
- title regex:            src/utils/render-detection.ts:24
- visible-text stripper:  src/utils/render-detection.ts:51-63 (X2)
- quality score:          src/utils/render-detection.ts:77-84 (X4)
- shell/render-need:      src/utils/render-detection.ts:86-128 (X5)
- soft-block detection:   src/utils/render-detection.ts:31-35,135-145 (X6)
- challenge keywords:     src/constants.ts:30-31 (X9)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java-regex ports of the reference's JS regexes.
TITLE_RX = r"(?i)<title[^>]*>([\s\S]*?)</title>"
HEADING_RX = r"(?i)<h[1-3][^>]*>"
MAIN_LIKE_RX = r"(?i)<(?:main|article)[^>]*>"
SCRIPT_TAG_RX = r"(?i)<script\b"
ROOT_CONTAINER_RX = r"""(?i)<div[^>]+id=["']?(?:root|app)\b["']?[^>]*>\s*(?:<!--[\s\S]*?-->\s*)*</div>"""
HAS_ROOT_CONTAINER_RX = r"""(?i)<(?:div|main|section)[^>]+id=["']?(?:root|app)\b["']?[^>]*>"""
NOSCRIPT_ENABLE_JS_RX = r"(?i)<noscript[\s\S]*?(enable javascript|requires javascript|javascript to run)"

SOFT_BLOCK_TITLE_RX = (
    r"(?i)just a moment|attention required|access denied|please wait|one more step"
    r"|checking your browser|security check|you have been blocked|blocked by|are you a robot"
)
SOFT_BLOCK_BODY_RX = (
    r"(?i)checking your browser|verify you.{0,10}(?:are |'re )?(?:not a )?(?:ro)?bot"
    r"|verify you.{0,10}human|please complete the security check|cf-challenge"
    r"|captcha-container|hcaptcha|recaptcha|cf-turnstile"
    r"|enable (?:javascript|cookies) to (?:continue|access|view)"
    r"|automated (?:access|request)|bot detect|suspicious activity|unusual traffic"
    r"|too many requests|rate limit exceeded|we need to verify"
)
CHALLENGE_KEYWORDS_RX = (
    r"(?i)cloudflare|checking your browser|please wait|verification|captcha|attention required"
)


def _collapse_ws(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def _entity_decode(col: Column) -> Column:
    """Parity: htmlEntityDecode (render-detection.ts:41-49)."""
    for pat, rep in (
        (r"(?i)&nbsp;", " "),
        (r"(?i)&amp;", "&"),
        (r"(?i)&lt;", "<"),
        (r"(?i)&gt;", ">"),
        (r"(?i)&quot;", "\""),
        (r"(?i)&#39;", "'"),
    ):
        col = F.regexp_replace(col, pat, rep)
    return col


def visible_text(html: Column) -> Column:
    """X2: strip HTML to visible text (render-detection.ts:51-63)."""
    c = html
    for pat in (
        r"<!--[\s\S]*?-->",
        r"(?i)<script[\s\S]*?</script>",
        r"(?i)<style[\s\S]*?</style>",
        r"(?i)<svg[\s\S]*?</svg>",
        r"(?i)<noscript[\s\S]*?</noscript>",
        r"<[^>]+>",
    ):
        c = F.regexp_replace(c, pat, " ")
    return _collapse_ws(_entity_decode(c))


def markdown_visible_text(md: Column) -> Column:
    """X3: strip Markdown to visible text (render-detection.ts:65-75)."""
    c = md
    for pat, rep in (
        (r"```[\s\S]*?```", " "),
        (r"`[^`]*`", " "),
        (r"!\[[^\]]*]\([^)]*\)", " "),
        (r"\[([^\]]*)\]\([^)]*\)", "$1"),
        (r"(?m)^#{1,6}\s+", ""),
        (r"[*_~>-]", " "),
    ):
        c = F.regexp_replace(c, pat, rep)
    return _collapse_ws(c)


TITLE_X1_RX = r"<title[^>]*>([^<]+)</title>"


def extracted_title(html: Column) -> Column:
    """X1: title extraction (FetchEngine.ts:126-127; constants.ts:27)."""
    return F.trim(F.regexp_extract(html, TITLE_X1_RX, 1))


def title_length(html: Column) -> Column:
    return F.length(_collapse_ws(_entity_decode(F.regexp_extract(html, TITLE_RX, 1))))


def script_count(html: Column) -> Column:
    return F.regexp_count(html, F.lit(SCRIPT_TAG_RX))


def heading_count(html: Column) -> Column:
    return F.regexp_count(html, F.lit(HEADING_RX))


def quality_score_expr(
    text_len: Column, title_len: Column, has_main_like: Column, headings: Column
) -> Column:
    """X4: scoreTextSignals (render-detection.ts:77-84)."""
    return (
        F.least(F.lit(6), F.floor(text_len / 120))
        + F.least(F.lit(2), F.floor(title_len / 12))
        + F.when(has_main_like, 2).otherwise(0)
        + F.when(headings > 0, 1).otherwise(0)
    )


def assess_html_render_need(html: Column) -> dict[str, Column]:
    """X5: assessHtmlRenderNeed (render-detection.ts:86-128) as a dict of
    named Columns; attach with ``df.withColumns(assess_html_render_need(...))``."""
    html_length = F.length(html)
    vis_len = F.length(visible_text(html))
    t_len = title_length(html)
    s_count = script_count(html)
    h_count = heading_count(html)
    has_main = html.rlike(MAIN_LIKE_RX)
    has_root = html.rlike(HAS_ROOT_CONTAINER_RX)
    has_empty_root = html.rlike(ROOT_CONTAINER_RX)
    has_noscript_js = html.rlike(NOSCRIPT_ENABLE_JS_RX)

    score = (
        F.when(t_len == 0, 3).otherwise(0)
        + F.when(vis_len < 80, 3).otherwise(0)
        + F.when(has_empty_root, 3).otherwise(0)
        + F.when(has_noscript_js, 2).otherwise(0)
        + F.when(html_length < 2000, 1).otherwise(0)
        + F.when((s_count >= 3) & (vis_len < 200), 1).otherwise(0)
        + F.when(has_root & (vis_len < 160), 1).otherwise(0)
        + F.when((~has_main) & (h_count == 0) & (vis_len < 120), 1).otherwise(0)
    )
    quality = (
        quality_score_expr(vis_len, t_len, has_main, h_count)
        - F.when(has_empty_root, 3).otherwise(0)
        - F.when(t_len == 0, 2).otherwise(0)
        - F.when(vis_len < 80, 2).otherwise(0)
    )
    return {
        "html_length": html_length,
        "visible_text_length": vis_len,
        "title_length": t_len,
        "script_count": s_count,
        "heading_count": h_count,
        "has_main_like": has_main,
        "has_root_container": has_root,
        "has_empty_root_container": has_empty_root,
        "has_noscript_enable_js": has_noscript_js,
        "render_likely_needed_score": score,
        "render_likely_needed": score >= 4,
        "quality_score": quality,
    }


def is_soft_block(html: Column) -> Column:
    """X6: isSoftBlockPage (render-detection.ts:135-145)."""
    vis_len = F.length(visible_text(html))
    title = F.regexp_extract(html, TITLE_RX, 1)
    return F.when(vis_len > 1500, F.lit(False)).otherwise(
        title.rlike(SOFT_BLOCK_TITLE_RX) | html.rlike(SOFT_BLOCK_BODY_RX)
    )


def is_challenge_page(html: Column) -> Column:
    """X9: challenge keyword gate (constants.ts:30-31)."""
    return html.rlike(CHALLENGE_KEYWORDS_RX)


def assess_serialized_content(content: Column, content_type: str) -> dict[str, Column]:
    """X7: assessSerializedContent (render-detection.ts:147-169) — returns
    {text_length, title_length, quality_score} columns for 'html' or
    'markdown' content."""
    if content_type == "html":
        a = assess_html_render_need(content)
        return {
            "text_length": a["visible_text_length"],
            "title_length": a["title_length"],
            "quality_score": a["quality_score"],
        }
    vis_len = F.length(markdown_visible_text(content))
    first_heading = F.regexp_extract(content, r"(?m)^#\s+(.+)$", 1)
    has_heading = first_heading != ""
    t_len = F.length(_collapse_ws(first_heading))
    return {
        "text_length": vis_len,
        "title_length": t_len,
        "quality_score": quality_score_expr(
            vis_len, t_len, F.lit(False), F.when(has_heading, 1).otherwise(0)
        ),
    }


def is_rendered_content_meaningfully_better(
    baseline: dict[str, Column], candidate: dict[str, Column]
) -> Column:
    """X8: isRenderedContentMeaningfullyBetter (render-detection.ts:171-180).
    Both args are X7 dicts (text_length, title_length, quality_score)."""
    return (
        (candidate["quality_score"] >= baseline["quality_score"] + 2)
        | (candidate["text_length"] >= F.greatest(F.lit(200), baseline["text_length"] * 2))
        | (
            (candidate["title_length"] > 0)
            & (baseline["title_length"] == 0)
            & (candidate["text_length"] >= baseline["text_length"])
        )
    )


# --- S2: raw-content text/binary split (FetchEngine.ts:211-225) -------------

_TEXT_MIME_RX = (
    r"^(?:text/|application/(?:json|xml|javascript|x-javascript|ecmascript"
    r"|x-www-form-urlencoded)|image/svg)"
)


def is_text_mime(mime: Column) -> Column:
    """Text-vs-binary content-type predicate (parity: the reference's
    isTextBased split in fetchContent, FetchEngine.ts:211-217)."""
    base = F.lower(F.trim(F.split(mime, ";").getItem(0)))
    return base.rlike(_TEXT_MIME_RX) | base.endswith("+json") | base.endswith("+xml")


def decode_if_text(payload: Column, mime: Column) -> Column:
    """S2 projection: binary column → decoded string for text MIME types,
    honoring the content-type charset parameter (parity: the reference's
    response.text() charset semantics, FetchEngine.ts:211-225); NULL for
    binary (the binary stays in its own column).

    Charset aliases map to JVM codecs (latin-1 → ISO-8859-1, ascii →
    US-ASCII, utf-16 variants); unknown or absent charsets decode as UTF-8
    with replacement characters — never a task failure.  Real crawl
    corpora are full of latin-1, so defaulting everything to UTF-8 (the
    previous behavior) silently mangled a large fraction of the web."""
    charset = F.upper(F.regexp_extract(mime, r"(?i)charset=[\"']?([A-Za-z0-9_-]+)", 1))
    decoded = (
        F.when(
            charset.isin("ISO-8859-1", "ISO8859-1", "LATIN-1", "LATIN1", "L1", "IBM819", "CP819"),
            F.decode(payload, "ISO-8859-1"),
        )
        .when(charset.isin("US-ASCII", "ASCII", "ANSI_X3.4-1968"), F.decode(payload, "US-ASCII"))
        .when(charset == "UTF-16", F.decode(payload, "UTF-16"))
        .when(charset == "UTF-16BE", F.decode(payload, "UTF-16BE"))
        .when(charset == "UTF-16LE", F.decode(payload, "UTF-16LE"))
        .otherwise(F.decode(payload, "UTF-8"))
    )
    return F.when(is_text_mime(mime), decoded).otherwise(F.lit(None))
