"""Hybrid-routing column tests, mirroring the reference's HybridEngine
behavior tests (reference: test/HybridEngine.test.ts:231-380)."""

import re

import pytest
from pyspark.sql import functions as F

from fetch_engines_spark.fixtures import (
    F10_APP_SHELL,
    F11_CONTENT_RICH,
    F12_CLOUDFLARE,
    F16_GENUINE_DOCS,
)
from fetch_engines_spark.routing import is_retryable, route_documents


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        ("shell", "https://app.example/", F10_APP_SHELL, 200),
        ("content", "https://example.com/article", F11_CONTENT_RICH, 200),
        ("cloudflare", "https://blocked.example/", F12_CLOUDFLARE, 403),
        ("docs", "https://docs.example/start", F16_GENUINE_DOCS, 200),
        ("gone", "https://example.com/missing", F10_APP_SHELL, 404),
        ("forced", "https://spa.example/app", F11_CONTENT_RICH, 200),
    ]
    return spark.createDataFrame(rows, "doc_id string, url string, html string, status int")


def routes(df):
    return {r.doc_id: r for r in df.collect()}


def test_app_shell_routes_to_render(spark, pages):
    r = routes(route_documents(pages, status_col="status"))
    assert r["shell"].route == "render"
    assert r["shell"].needs_render is True


def test_content_page_stays_http(spark, pages):
    r = routes(route_documents(pages, status_col="status"))
    assert r["content"].route == "http"
    assert r["docs"].route == "http"


def test_soft_block_escalates(spark, pages):
    r = routes(route_documents(pages, status_col="status"))
    assert r["cloudflare"].soft_block is True
    assert r["cloudflare"].route == "render"


def test_404_never_falls_back(spark, pages):
    """Parity: HTTP 404 → no Playwright fallback (HybridEngine.ts:206-210)."""
    r = routes(route_documents(pages, status_col="status"))
    assert r["gone"].route == "http"  # even though the page is a shell


def test_playwright_only_patterns(spark, pages):
    r = routes(
        route_documents(
            pages,
            status_col="status",
            playwright_only_patterns=["spa.example", re.compile(r"docs\.example/st")],
        )
    )
    assert r["forced"].route == "render" and r["forced"].playwright_only is True
    assert r["docs"].route == "render"
    assert r["content"].playwright_only is False


def test_force_spa_renders_everything_except_404(spark, pages):
    r = routes(route_documents(pages, status_col="status", force_spa=True))
    assert all(v.route == "render" for k, v in r.items() if k != "gone")
    assert r["gone"].route == "http"


def test_retry_only_transient(spark):
    df = spark.createDataFrame(
        [("ERR_FETCH_FAILED",), ("ERR_NAVIGATION_TIMEOUT",), ("ERR_HTTP_ERROR",)],
        "error_code string",
    )
    out = {r.error_code: r.retry for r in df.select(
        "error_code", is_retryable(F.col("error_code")).alias("retry")
    ).collect()}
    assert out == {
        "ERR_FETCH_FAILED": True,
        "ERR_NAVIGATION_TIMEOUT": False,
        "ERR_HTTP_ERROR": False,
    }


def test_route_content_format(spark):
    from pyspark.sql import functions as F

    from fetch_engines_spark.routing import route_content_format

    rows = [
        ("a", "text/html; charset=utf-8"),
        ("b", "application/pdf"),
        ("c", "application/json"),
        ("d", "image/png"),
        ("e", "application/xhtml+xml"),
    ]
    df = spark.createDataFrame(rows, "id string, mime string")
    got = {
        r.id: r.route
        for r in df.select("id", route_content_format(F.col("mime")).alias("route")).collect()
    }
    assert got == {"a": "html", "b": "pdf", "c": "text", "d": "binary", "e": "html"}
