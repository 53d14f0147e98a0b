"""Structured-data extraction stage (SURVEY.md §2.6 O7).

The reference's ``StructuredContentEngine`` (reference:
src/StructuredContentEngine.ts:69-433) fetches markdown via the hybrid
engine, validates that every field of the caller's Zod schema carries a
description, assembles a field-guidance prompt, and calls an
OpenAI-compatible ``generateObject``.

Spark restatement: the schema is a ``StructType`` whose fields carry a
``description`` in their metadata; validation and prompt assembly are
pure functions (below); the LLM call itself is a downstream stage that
consumes the extraction output table and is STUBBED here (no network in
this environment).  The prompt text mirrors the reference's system prompt
(StructuredContentEngine.ts:196-216).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


class SchemaDescriptionError(ValueError):
    """Raised when schema fields lack descriptions (parity:
    validateSchemaDescriptions, StructuredContentEngine.ts:117-158)."""


def field_descriptions(schema: StructType) -> dict[str, str]:
    out: dict[str, str] = {}
    for f in schema.fields:
        desc = (f.metadata or {}).get("description")
        if desc:
            out[f.name] = desc
    return out


def validate_schema_descriptions(schema: StructType) -> None:
    """Every field must carry metadata={'description': ...} (parity with the
    reference's required .describe() on every Zod field)."""
    if not isinstance(schema, StructType):
        raise SchemaDescriptionError(
            "Schema must be a StructType. Use StructType([...StructField...]) "
            "to define your schema structure."
        )
    missing = [f.name for f in schema.fields if not (f.metadata or {}).get("description")]
    if missing:
        example = missing[0]
        raise SchemaDescriptionError(
            f"All schema fields must have descriptions. Missing descriptions for: {', '.join(missing)}\n\n"
            f"Example:\n"
            f"StructType([\n"
            f'  StructField("{example}", StringType(), metadata={{"description": "Description of {example}"}}),\n'
            f"  # ... other fields\n"
            f"])"
        )


def build_extraction_prompt(
    schema: StructType, markdown: str, custom_prompt: str = ""
) -> str:
    """Assemble the per-document extraction prompt (parity:
    StructuredContentEngine.ts:196-216)."""
    guidance = "\n".join(
        f"- {field}: {desc}" for field, desc in field_descriptions(schema).items()
    )
    custom = f"\nAdditional context: {custom_prompt}" if custom_prompt else ""
    return (
        "You are an expert at extracting structured data from web content. \n"
        "Extract the requested information from the provided markdown content accurately and completely.\n"
        "Return the data as a valid JSON object matching the exact schema provided.\n\n"
        f"Field requirements:\n{guidance}\n\n"
        "IMPORTANT: Pay careful attention to data types:\n"
        "- Numbers should be returned as numeric values (not strings with currency symbols)\n"
        "- Strings should be returned as plain text strings\n"
        "- Follow the exact schema structure and field descriptions provided above\n"
        f"{custom}\n\n"
        f"Content to analyze:\n{markdown}"
    )


def generate_object(prompt: str, schema: StructType) -> dict:  # pragma: no cover
    """The OpenAI-compatible generateObject call — STUB.

    No network access in this environment; wire an inference client here
    (the reference uses model-specific config: gpt-5 → reasoning_effort
    low, gpt-4.1 → temperature 0; StructuredContentEngine.ts:389-404).
    """
    raise NotImplementedError("LLM inference is not available in this environment")


def prompts_for_documents(
    extracted: DataFrame,
    schema: StructType,
    custom_prompt: str = "",
    markdown_col: str = "markdown",
) -> DataFrame:
    """extracted(doc_id, markdown) → (doc_id, prompt): the distributed half
    of O7.  Validates the schema once on the driver, then builds per-doc
    prompts in an Arrow-batched stage; the stubbed LLM call is the only
    non-distributed piece."""
    validate_schema_descriptions(schema)
    guidance_schema = schema  # captured by the closure below

    out_schema = StructType(
        [StructField("doc_id", StringType()), StructField("prompt", StringType())]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "prompt": [
                        build_extraction_prompt(guidance_schema, md or "", custom_prompt)
                        for md in pdf[markdown_col]
                    ],
                }
            )

    return extracted.select("doc_id", markdown_col).mapInPandas(build, schema=out_schema)
