"""Source-format ingestion for the documents table.

The engine's canonical input is parquet/Iceberg with the interleaved span
schema (BASELINE.json input_hint); real crawl corpora also arrive as JSONL
dumps (one document per line).  ``read_documents_jsonl`` enforces the
canonical schema and routes malformed lines to a rejects DataFrame instead
of failing the job — at 10^12 documents a single corrupt line must never
kill a stage, and silent dropping would corrupt lineage accounting.

Scale notes: the JSON scan is schema-enforced (no sampling pass over the
corpus — schema inference at 100 TB is a full extra read), splittable per
file, and PERMISSIVE, so the parse cost is one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .extract import INPUT_SCHEMA

_CORRUPT = "_corrupt_record"


def read_documents_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """JSONL → (documents, rejects).

    documents matches INPUT_SCHEMA; rejects carries the raw corrupt line
    for quarantine/inspection.  Spark requires materializing the parsed
    relation before the corrupt-record column may be filtered on
    (SPARK-26243) — done here via the json() reader's PERMISSIVE mode plus
    a from_json re-parse of the raw line, which keeps the whole thing one
    scan without a cache barrier.
    """
    raw = spark.read.text(path).withColumnRenamed("value", "_raw")
    parsed = raw.withColumn(
        "_doc",
        F.from_json(
            F.col("_raw"),
            StructType(list(INPUT_SCHEMA.fields)),
        ),
    )
    # a line is corrupt iff from_json failed entirely (malformed JSON);
    # lines with missing optional fields parse with nulls, like parquet
    is_bad = F.col("_doc").isNull() | F.col("_doc.doc_id").isNull()
    documents = (
        parsed.filter(~is_bad)
        .select(*[F.col(f"_doc.{f.name}").alias(f.name) for f in INPUT_SCHEMA.fields])
    )
    rejects = parsed.filter(is_bad).select(F.col("_raw").alias("raw_line"))
    return documents, rejects


EVENTS_CSV_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
)


def read_events_csv(
    spark: SparkSession, path: str, schema_ddl: str = EVENTS_CSV_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """CSV → (events, rejects), the same schema-enforced + quarantine
    contract as the JSONL source: one text scan, from_csv with an
    explicit DDL schema (no inference pass), malformed lines routed to a
    rejects DataFrame with the raw line preserved."""
    raw = spark.read.text(path).withColumnRenamed("value", "_raw")
    parsed = raw.withColumn(
        "_row", F.from_csv(F.col("_raw"), schema_ddl, {"mode": "PERMISSIVE"})
    )
    # Spark's own DDL parser handles every form (DECIMAL(18,2),
    # STRUCT<a: INT, ...>) — a hand-rolled comma split mis-parses
    # angle-bracket types
    names = StructType.fromDDL(schema_ddl).fieldNames()
    # a row is corrupt if it failed to parse or its leading (required)
    # fields are null — a truncated line parses its first cell and nulls
    # the rest, which schema enforcement must also quarantine
    is_bad = F.col("_row").isNull()
    for n in names[: min(2, len(names))]:
        is_bad = is_bad | F.col(f"_row.{n}").isNull()
    events = parsed.filter(~is_bad).select(
        *[F.col(f"_row.{n}").alias(n) for n in names]
    )
    rejects = parsed.filter(is_bad).select(F.col("_raw").alias("raw_line"))
    return events, rejects
