"""Eval-gate harness tests (§5 layer 5 parity)."""

import pytest

from fetch_engines_spark.evals import (
    CASE_SCHEMA,
    evaluate_cases,
    fixture_eval_cases,
    gate_report,
)
from fetch_engines_spark.extract import INPUT_SCHEMA, extract_spans
from fetch_engines_spark.fixtures import fixture_document_rows


@pytest.fixture(scope="module")
def evaluated(spark):
    docs = spark.createDataFrame(fixture_document_rows(), INPUT_SCHEMA)
    extracted = extract_spans(docs, keep_markdown=True)
    cases = spark.createDataFrame(fixture_eval_cases(), CASE_SCHEMA)
    return evaluate_cases(cases, extracted).cache()


def test_per_case_checks(evaluated):
    rows = {r.doc_id: r for r in evaluated.collect()}
    assert rows["F02"].has_markdown and rows["F02"].required_any_ok and rows["F02"]["pass"]
    assert rows["F08"]["pass"]
    # the app shell produces no content → fails (its category is spa,
    # which the gate tolerates at the 0.5 threshold)
    assert not rows["F10"]["pass"]


def test_gate_report_passes_on_fixture_corpus(evaluated):
    report = gate_report(evaluated)
    assert report["gated_cases"] == 13
    assert report["gated_static_pass_rate"] == 1.0
    assert report["gated_pass_rate"] >= 0.8
    assert report["pass"] is True


def test_gate_fails_when_static_breaks(spark, evaluated):
    """Tampering a static case's keyword must trip the 1.0 static gate."""
    cases = [list(c) for c in fixture_eval_cases()]
    for c in cases:
        if c[0] == "F02":
            c[4] = ["THIS KEYWORD DOES NOT EXIST"]
    docs = spark.createDataFrame(fixture_document_rows(), INPUT_SCHEMA)
    extracted = extract_spans(docs, keep_markdown=True)
    tampered = evaluate_cases(
        spark.createDataFrame([tuple(c) for c in cases], CASE_SCHEMA), extracted
    )
    report = gate_report(tampered)
    assert report["gated_static_pass_rate"] < 1.0
    assert report["pass"] is False


def test_empty_gated_set_rate_is_zero(spark, evaluated):
    ungated = evaluated.withColumn("gate", evaluated["gate"] & False)
    report = gate_report(ungated)
    assert report["gated_pass_rate"] == 0.0
    assert report["gated_static_pass_rate"] == 1.0  # empty bucket defaults
