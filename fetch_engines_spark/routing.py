"""Hybrid-engine routing semantics as batch columns (SURVEY.md §2.6 O1/O2/O4).

The reference's production path fetches via HTTP first and escalates to a
browser render only when needed (reference: src/HybridEngine.ts:126-223).
At batch scale the corpus is pre-landed HTML, so the routing *decision*
survives as a classification column used for metrics and for filtering a
(hypothetical) second render stage:

- O1 auto-render:  ``needs_render = force_spa OR soft_block OR shell_score>=4``
  (HybridEngine.ts:58-66)
- O4 pattern routing: URL string/regex patterns force the browser path
  (HybridEngine.ts:160-170, 237-249)
- 404-no-fallback: an HTTP 404 never escalates (HybridEngine.ts:206-210)
- O2/O3 error taxonomy (src/errors.ts:1-31): FetchError{code, statusCode}
  becomes (error_code, status_code) columns; retryability mirrors
  _shouldRetryFetchEngine (only ERR_FETCH_FAILED retries,
  HybridEngine.ts:68-124, pinned by test/HybridEngine.test.ts:248-289).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import classifiers as X

# Error-code taxonomy (parity: src/errors.ts + codes used across engines).
ERR_FETCH_FAILED = "ERR_FETCH_FAILED"
ERR_HTTP_ERROR = "ERR_HTTP_ERROR"
ERR_NON_HTML_CONTENT = "ERR_NON_HTML_CONTENT"
ERR_NAVIGATION_TIMEOUT = "ERR_NAVIGATION_TIMEOUT"
ERR_MARKDOWN_CONVERSION_NON_HTML = "ERR_MARKDOWN_CONVERSION_NON_HTML"

RETRYABLE_CODES = (ERR_FETCH_FAILED,)  # HybridEngine retries ONLY this code


def is_retryable(error_code: Column) -> Column:
    """O2: retry only transient fetch failures — never timeouts/HTTP errors
    (parity: _shouldRetryFetchEngine, HybridEngine.ts:68-70)."""
    return error_code.isin(*RETRYABLE_CODES)


def matches_playwright_only(url: Column, patterns: list[str | re.Pattern]) -> Column:
    """O4: URL patterns that force the browser path.  String patterns are
    substring matches; regex patterns are rlike (parity:
    HybridEngine.ts:237-249 string.includes / RegExp.test)."""
    cond = F.lit(False)
    for p in patterns:
        if isinstance(p, re.Pattern):
            cond = cond | url.rlike(p.pattern)
        else:
            cond = cond | url.contains(p)
    return cond


def route_documents(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    status_col: str | None = None,
    playwright_only_patterns: list[str | re.Pattern] | None = None,
    force_spa: bool = False,
) -> DataFrame:
    """Attach the hybrid-routing decision columns.

    route ∈ {'render', 'http'}:
    - 'render' if the URL matches a playwrightOnly pattern (O4), or the
      page is a soft-block / app shell (O1) — unless HTTP status is 404,
      which never falls back (HybridEngine.ts:206-210).
    """
    html = F.col(html_col)
    shell = X.assess_html_render_need(html)
    soft = X.is_soft_block(html)
    pattern_hit = (
        matches_playwright_only(F.col(url_col), playwright_only_patterns)
        if playwright_only_patterns
        else F.lit(False)
    )
    needs_render = F.lit(force_spa) | soft | shell["render_likely_needed"]
    if status_col is not None:
        no_fallback = F.col(status_col) == 404
    else:
        no_fallback = F.lit(False)
    route = (
        F.when(pattern_hit, F.lit("render"))
        .when(no_fallback, F.lit("http"))
        .when(needs_render, F.lit("render"))
        .otherwise(F.lit("http"))
    )
    return df.withColumns(
        {
            "soft_block": soft,
            "render_score": shell["render_likely_needed_score"],
            "quality_score": shell["quality_score"],
            "needs_render": needs_render,
            "playwright_only": pattern_hit,
            "route": route,
        }
    )


def route_content_format(mime: Column) -> Column:
    """Content-format routing for the extraction stage: which parser a
    payload goes to.  'html' → the DOM extraction stage (extract.py),
    'pdf' → the PDF/layout parser (pdf.py), 'text' → direct text (no DOM),
    'binary' → multimodal passthrough by media_ref.  Native column — the
    router is a partition-pruned filter at 100 TB, not a UDF."""
    base = F.lower(F.trim(F.split(mime, ";").getItem(0)))
    return (
        F.when(base.isin("text/html", "application/xhtml+xml"), F.lit("html"))
        .when(base == "application/pdf", F.lit("pdf"))
        .when(X.is_text_mime(mime), F.lit("text"))
        .otherwise(F.lit("binary"))
    )
