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
from pyspark.sql import functions as F
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


def validate_generated_objects(
    responses: DataFrame,
    schema: StructType,
    response_col: str = "response",
    finish_col: str | None = "finish_reason",
) -> DataFrame:
    """Batch analog of the reference's NoObjectGeneratedError analysis
    (parity: StructuredContentEngine.ts:258-360): classify each model
    response into typed error columns instead of a thrown exception, so a
    future inference stage's failures are queryable at corpus scale.

    Taxonomy (error_kind):
    - ``invalid_json``   response is not a JSON object (reference: the
      JSON.parse-fails branch → raw-text excerpt)
    - ``key_mismatch``   keys have weird prefixes (leading dot, embedded
      space) or are not in the schema (reference: hasWeirdKeys)
    - ``missing_field``  an expected key is absent
    - ``type_mismatch``  a key is present but fails schema typing, e.g.
      number expected / string received (reference: the Zod
      type-validation branch + its number-as-string tip)
    - ``truncated``      finishReason signals an incomplete generation
    - NULL               the object validates; typed columns are populated

    Everything is native columns (from_json twice: once as
    map<string,string> for key analysis, once with the caller schema for
    typing) — no Python in the path, so it runs at 10^12-row scale."""
    expected = [f.name for f in schema.fields]
    numeric_fields = [
        f.name for f in schema.fields if f.dataType.typeName() in ("double", "float", "long", "integer")
    ]
    out = responses.withColumn("_map", F.from_json(F.col(response_col), "map<string,string>"))
    out = out.withColumn("_typed", F.from_json(F.col(response_col), schema))
    # sorted: map key order is engine-internal, not JSON document order
    received = F.array_sort(
        F.coalesce(F.map_keys(F.col("_map")), F.array().cast("array<string>"))
    )
    weird = F.exists(
        received,
        lambda k: k.startswith(".") | k.contains(" ") | ~k.isin(*expected),
    )
    missing = F.filter(
        F.array(*[F.lit(n) for n in expected]), lambda n: ~F.array_contains(received, n)
    )
    mismatched = F.filter(
        F.array(*[F.lit(n) for n in expected]),
        lambda n: F.array_contains(received, n)
        & F.coalesce(
            *[
                F.when(n == fname, F.col(f"_typed.{fname}").isNull())
                for fname in expected
            ]
        ),
    )
    finish = (
        F.col(finish_col)
        if finish_col and finish_col in responses.columns
        else F.lit(None).cast("string")
    )
    error_kind = (
        F.when(
            finish.isNotNull() & ~finish.isin("stop", "unknown"), F.lit("truncated")
        )
        .when(F.col("_map").isNull(), F.lit("invalid_json"))
        .when(weird, F.lit("key_mismatch"))
        .when(F.size(missing) > 0, F.lit("missing_field"))
        .when(F.size(mismatched) > 0, F.lit("type_mismatch"))
        .otherwise(F.lit(None).cast("string"))
    )
    # number-as-string detection drives the reference's transform tip
    numeric_mismatched = F.filter(
        mismatched, lambda n: n.isin(*numeric_fields) if numeric_fields else F.lit(False)
    )
    detail = F.when(
        error_kind == "invalid_json",
        F.concat(F.lit("Model response is not a JSON object: "), F.substring(F.col(response_col), 1, 300)),
    ).when(
        error_kind == "key_mismatch",
        F.concat(
            F.lit("Key mismatch. Expected: "),
            F.lit(", ".join(expected)),
            F.lit(" Received: "),
            F.concat_ws(", ", received),
        ),
    ).when(
        error_kind == "missing_field",
        F.concat(F.lit("Missing fields: "), F.concat_ws(", ", missing)),
    ).when(
        (error_kind == "type_mismatch") & (F.size(numeric_mismatched) > 0),
        F.concat(
            F.lit("Type validation failed for: "),
            F.concat_ws(", ", mismatched),
            F.lit(". Tip: fields ("),
            F.concat_ws(", ", numeric_mismatched),
            F.lit(") returned as strings but expected numbers."),
        ),
    ).when(
        error_kind == "type_mismatch",
        F.concat(F.lit("Type validation failed for: "), F.concat_ws(", ", mismatched)),
    ).when(
        error_kind == "truncated",
        F.concat(F.lit("Finish reason: "), finish),
    )
    keep = [c for c in responses.columns if c not in ("_map", "_typed")]
    return out.select(
        *keep,
        (error_kind.isNull()).alias("ok"),
        error_kind.alias("error_kind"),
        received.alias("received_keys"),
        missing.alias("missing_fields"),
        mismatched.alias("mismatched_fields"),
        detail.alias("error_detail"),
        *[F.col(f"_typed.{n}").alias(f"out_{n}") for n in expected],
    )


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
