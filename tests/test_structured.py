"""O7 structured-extraction stage tests (mirrors the reference's schema
validation behavior, test/StructuredContentEngine.test.ts semantics)."""

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from fetch_engines_spark.structured import (
    SchemaDescriptionError,
    build_extraction_prompt,
    generate_object,
    prompts_for_documents,
    validate_schema_descriptions,
)

GOOD = StructType(
    [
        StructField("title", StringType(), metadata={"description": "The page title"}),
        StructField("price", StringType(), metadata={"description": "Product price"}),
    ]
)

BAD = StructType(
    [
        StructField("title", StringType(), metadata={"description": "The page title"}),
        StructField("price", StringType()),
    ]
)


def test_validate_accepts_described_schema():
    validate_schema_descriptions(GOOD)


def test_validate_rejects_missing_descriptions():
    with pytest.raises(SchemaDescriptionError) as e:
        validate_schema_descriptions(BAD)
    assert "price" in str(e.value)
    assert "All schema fields must have descriptions" in str(e.value)


def test_prompt_contains_guidance_and_content():
    prompt = build_extraction_prompt(GOOD, "# Product\n\n$32", custom_prompt="shop page")
    assert "- title: The page title" in prompt
    assert "- price: Product price" in prompt
    assert "Additional context: shop page" in prompt
    assert prompt.endswith("# Product\n\n$32")


def test_llm_call_is_stubbed():
    with pytest.raises(NotImplementedError):
        generate_object("p", GOOD)


def test_prompts_for_documents(spark):
    df = spark.createDataFrame(
        [("d1", "# One"), ("d2", None)], "doc_id string, markdown string"
    )
    rows = {r.doc_id: r.prompt for r in prompts_for_documents(df, GOOD).collect()}
    assert rows["d1"].endswith("# One")
    assert "Field requirements" in rows["d2"]


def test_prompts_rejects_bad_schema_before_any_job(spark):
    df = spark.createDataFrame([("d1", "# One")], "doc_id string, markdown string")
    with pytest.raises(SchemaDescriptionError):
        prompts_for_documents(df, BAD)


def test_validate_generated_objects_taxonomy(spark):
    """Batch NoObjectGenerated analysis (parity:
    StructuredContentEngine.ts:258-360): every failure class lands in the
    right error_kind with queryable fields."""
    from pyspark.sql.types import BooleanType, DoubleType, StringType, StructField, StructType

    from fetch_engines_spark.structured import validate_generated_objects

    schema = StructType(
        [
            StructField("title", StringType(), metadata={"description": "t"}),
            StructField("price", DoubleType(), metadata={"description": "p"}),
            StructField("in_stock", BooleanType(), metadata={"description": "s"}),
        ]
    )
    rows = [
        ("ok", '{"title": "W", "price": 1.5, "in_stock": true}', "stop"),
        ("prose", "here you go!", "stop"),
        ("weird", '{".title": "W", "price": 1.5, "in_stock": true}', "stop"),
        ("missing", '{"title": "W"}', "stop"),
        ("numstr", '{"title": "W", "price": "$1.50", "in_stock": true}', "stop"),
        ("cut", '{"title": "W", "pri', "length"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, response string, finish_reason string")
    got = {r.doc_id: r for r in validate_generated_objects(df, schema).collect()}

    assert got["ok"].ok and got["ok"].error_kind is None
    assert got["ok"].out_price == 1.5 and got["ok"].out_in_stock is True
    assert got["prose"].error_kind == "invalid_json"
    assert got["weird"].error_kind == "key_mismatch"
    assert got["missing"].error_kind == "missing_field"
    assert got["missing"].missing_fields == ["price", "in_stock"]
    assert got["numstr"].error_kind == "type_mismatch"
    assert got["numstr"].mismatched_fields == ["price"]
    assert "expected numbers" in got["numstr"].error_detail  # the reference's tip
    assert got["cut"].error_kind == "truncated"
