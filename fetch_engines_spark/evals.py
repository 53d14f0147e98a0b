"""Quality-matrix eval harness (SURVEY.md §5 layer 5).

The reference gates releases on a live eval matrix: per-case checks
{markdown produced, min text length, required-keyword hit} rolled up into
gated pass rates with thresholds 0.8 overall / 1.0 static / 0.5 SPA
(reference: src/evals/auto-render-cases.ts:12-25;
scripts/eval-auto-render.mjs:28-60).

Batch restatement: eval cases are a DataFrame joined against extraction
output; checks and pass-rate roll-ups are native Column expressions, so
the whole gate is one Spark job over any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .classifiers import markdown_visible_text

# Gate thresholds (parity: auto-render-cases.ts:23-25)
MIN_GATED_PASS_RATE = 0.8
MIN_GATED_STATIC_PASS_RATE = 1.0
MIN_GATED_SPA_PASS_RATE = 0.5

CASE_SCHEMA = (
    "doc_id string, name string, category string, archetype string, "
    "required_any array<string>, min_text_length int, gate boolean"
)


def evaluate_cases(cases: DataFrame, extracted: DataFrame) -> DataFrame:
    """cases ⋈ extraction output → per-case check columns + pass flag.

    Checks (parity: per-URL checks in eval-auto-render.mjs): markdown
    produced, visible text ≥ min_text_length, any required keyword present.
    """
    joined = cases.join(
        extracted.select("doc_id", "markdown", "error"), "doc_id", "left"
    )
    md = F.coalesce(F.col("markdown"), F.lit(""))
    text_len = F.length(markdown_visible_text(md))
    required_hit = F.when(
        F.col("required_any").isNull() | (F.size("required_any") == 0), F.lit(True)
    ).otherwise(
        F.exists(F.col("required_any"), lambda kw: F.instr(md, kw) > 0)
    )
    checks = {
        "has_markdown": md != "",
        "min_length_ok": text_len >= F.col("min_text_length"),
        "required_any_ok": required_hit,
        "no_error": F.col("error").isNull(),
    }
    out = joined.withColumns(checks)
    return out.withColumn(
        "pass",
        F.col("has_markdown")
        & F.col("min_length_ok")
        & F.col("required_any_ok")
        & F.col("no_error"),
    )


def gate_report(evaluated: DataFrame) -> dict:
    """Roll up gated pass rates and apply the release gate (parity:
    eval-auto-render.mjs:28-60 — empty static/spa buckets default to 1.0,
    empty gated set defaults to 0.0)."""
    agg = evaluated.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("gate"), 1).otherwise(0)).alias("gated"),
        F.sum(F.when(F.col("gate") & F.col("pass"), 1).otherwise(0)).alias("gated_pass"),
        F.sum(F.when(F.col("gate") & (F.col("category") == "static"), 1).otherwise(0)).alias("gs"),
        F.sum(
            F.when(F.col("gate") & (F.col("category") == "static") & F.col("pass"), 1).otherwise(0)
        ).alias("gs_pass"),
        F.sum(F.when(F.col("gate") & (F.col("category") == "spa"), 1).otherwise(0)).alias("gp"),
        F.sum(
            F.when(F.col("gate") & (F.col("category") == "spa") & F.col("pass"), 1).otherwise(0)
        ).alias("gp_pass"),
    ).collect()[0]
    gated_rate = 0.0 if agg.gated == 0 else agg.gated_pass / agg.gated
    static_rate = 1.0 if agg.gs == 0 else agg.gs_pass / agg.gs
    spa_rate = 1.0 if agg.gp == 0 else agg.gp_pass / agg.gp
    return {
        "total_cases": agg.total,
        "gated_cases": agg.gated,
        "gated_pass_rate": round(gated_rate, 4),
        "gated_static_pass_rate": round(static_rate, 4),
        "gated_spa_pass_rate": round(spa_rate, 4),
        "thresholds": {
            "gated": MIN_GATED_PASS_RATE,
            "static": MIN_GATED_STATIC_PASS_RATE,
            "spa": MIN_GATED_SPA_PASS_RATE,
        },
        "pass": (
            gated_rate >= MIN_GATED_PASS_RATE
            and static_rate >= MIN_GATED_STATIC_PASS_RATE
            and spa_rate >= MIN_GATED_SPA_PASS_RATE
        ),
    }


def fixture_eval_cases() -> list[tuple]:
    """Eval cases over the fixture corpus (archetypes mirror the
    reference's 7-archetype matrix where a batch analog exists)."""
    return [
        ("F01", "headerless table", "static", "static-baseline", ["| **Position** |"], 40, True),
        ("F02", "commerce page", "static", "commerce", ["Romar", "Add to basket"], 60, True),
        ("F03", "article nested chrome", "static", "knowledge", ["Upfront Carbon Emissions"], 40, True),
        ("F04", "relative URLs", "static", "commerce", ["https://rebuilt.eco/about-us"], 40, True),
        ("F05", "buttons stripped", "static", "commerce", ["Product Title"], 30, True),
        ("F06", "dense link run", "static", "marketing", ["One product with a long descriptive title"], 80, True),
        ("F07", "heading-led links", "static", "marketing", ["Recent News"], 20, True),
        ("F08", "docs sidebar", "static", "docs", ["npm install my-framework"], 100, True),
        ("F09", "shared container docs", "static", "docs", ["comprehensive guide"], 100, True),
        ("F10", "app shell (unrendered)", "spa", "access-guarded", [], 1, True),  # fails: shell has no content
        ("F11", "hydrated SPA output", "spa", "marketing", ["Example article"], 40, True),
        ("F16", "genuine docs", "static", "docs", ["Getting Started"], 100, True),
        ("F17", "long article", "static", "knowledge", ["verify your deployment"], 200, True),
        ("F19", "title page", "static", "static-baseline", ["Some body content"], 10, False),
    ]
