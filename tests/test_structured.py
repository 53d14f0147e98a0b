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
