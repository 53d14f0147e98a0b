"""Native-column classifier tests (X-family), mirroring the reference's
RenderDetection suite (reference: test/RenderDetection.test.ts:10-161)."""

import pytest
from pyspark.sql import functions as F

from fetch_engines_spark import classifiers as X
from fetch_engines_spark.fixtures import FIXTURES


@pytest.fixture(scope="module")
def classified(spark):
    rows = [
        (f.id, f.html, f.expect_render_needed, f.expect_soft_block, f.expect_title)
        for f in FIXTURES
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, html string, exp_render boolean, exp_soft boolean, exp_title string"
    )
    out = (
        df.withColumns(X.assess_html_render_need(F.col("html")))
        .withColumn("soft_block", X.is_soft_block(F.col("html")))
        .withColumn("title", X.extracted_title(F.col("html")))
        .withColumn("challenge", X.is_challenge_page(F.col("html")))
    )
    return {r.doc_id: r for r in out.collect()}


def test_app_shell_needs_render(classified):
    r = classified["F10"]
    assert r.render_likely_needed is True
    assert r.render_likely_needed_score >= 4


def test_content_rich_page_no_render(classified):
    r = classified["F11"]
    assert r.render_likely_needed is False
    assert r.quality_score > 0


@pytest.mark.parametrize("fid", ["F12", "F13", "F14", "F15"])
def test_soft_block_positive(classified, fid):
    assert classified[fid].soft_block is True, fid


@pytest.mark.parametrize("fid", ["F16", "F17", "F18"])
def test_soft_block_negative(classified, fid):
    assert classified[fid].soft_block is False, fid


def test_title_extraction(classified):
    assert classified["F19"].title == "Hello"


def test_expectations_hold_for_all_fixtures(classified):
    for fid, r in classified.items():
        if r.exp_render is not None:
            assert r.render_likely_needed == r.exp_render, fid
        if r.exp_soft is not None:
            assert r.soft_block == r.exp_soft, fid
        if r.exp_title is not None:
            assert r.title == r.exp_title, fid


def test_challenge_keyword_gate(classified):
    assert classified["F12"].challenge is True  # "checking your browser"
    assert classified["F15"].challenge is True  # "please wait"


def test_classifiers_are_whole_stage_codegen(spark):
    """The X-family must stay JVM-side: no Python eval nodes in the plan."""
    df = spark.createDataFrame([("<html></html>",)], "html string")
    out = df.withColumns(X.assess_html_render_need(F.col("html"))).withColumn(
        "soft_block", X.is_soft_block(F.col("html"))
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_rendered_content_meaningfully_better(spark):
    """Parity: RenderDetection.test.ts:53-61 — empty app shell baseline vs
    rendered markdown candidate."""
    from fetch_engines_spark.classifiers import (
        assess_serialized_content,
        is_rendered_content_meaningfully_better,
    )

    df = spark.createDataFrame(
        [
            (
                '<html><head><title></title></head><body><div id="app"></div></body></html>',
                "# Example article\n\nThis rendered content now includes the title and body text that were missing before.",
            )
        ],
        "html string, md string",
    )
    baseline = assess_serialized_content(F.col("html"), "html")
    candidate = assess_serialized_content(F.col("md"), "markdown")
    row = df.select(
        is_rendered_content_meaningfully_better(baseline, candidate).alias("better")
    ).collect()[0]
    assert row.better is True


def test_mime_text_binary_split(spark):
    from fetch_engines_spark.classifiers import decode_if_text, is_text_mime

    rows = [
        ("a", b"hello world", "text/html; charset=utf-8"),
        ("b", b'{"k":1}', "application/json"),
        ("c", b"\x89PNG\r\n", "image/png"),
        ("d", b"<svg/>", "image/svg+xml"),
        ("e", b"%PDF-1.4", "application/pdf"),
        ("f", b"<x/>", "application/atom+xml"),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary, mime string")
    out = {
        r.id: (r.is_text, r.text)
        for r in df.select(
            "id",
            is_text_mime(F.col("mime")).alias("is_text"),
            decode_if_text(F.col("payload"), F.col("mime")).alias("text"),
        ).collect()
    }
    assert out["a"] == (True, "hello world")
    assert out["b"][0] is True
    assert out["c"] == (False, None)
    assert out["d"][0] is True  # svg is text-based in the reference's split
    assert out["e"] == (False, None)
    assert out["f"][0] is True


def test_decode_if_text_honors_charset(spark):
    """Charset-aware S2 decode: latin-1 / ascii / utf-16 payloads decode to
    the same strings Python's codecs produce; binary stays NULL."""
    from pyspark.sql import functions as F

    from fetch_engines_spark.classifiers import decode_if_text

    rows = [
        ("latin", "café ©1999".encode("latin-1"), "text/html; charset=ISO-8859-1"),
        ("latin2", "±2°".encode("latin-1"), "text/plain; charset=latin-1"),
        ("utf16", "павло ü".encode("utf-16"), "text/plain; charset=utf-16"),
        ("ascii", b"plain", "text/plain; charset=us-ascii"),
        ("default", "über".encode("utf-8"), "text/html"),
        ("binary", b"\x89PNG", "image/png"),
    ]
    df = spark.createDataFrame(rows, "content_id string, payload binary, mime string")
    got = {
        r.content_id: r.text
        for r in df.select(
            "content_id", decode_if_text(F.col("payload"), F.col("mime")).alias("text")
        ).collect()
    }
    assert got["latin"] == "café ©1999"
    assert got["latin2"] == "±2°"
    assert got["utf16"] == "павло ü"
    assert got["ascii"] == "plain"
    assert got["default"] == "über"
    assert got["binary"] is None
