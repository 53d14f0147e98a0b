"""Structured Streaming front-end for the extraction engine.

The reference is a batch request/response system (no watermarks or stateful
streaming — SURVEY.md §1), so this module is the Spark-native *extension*:
the same single extraction stage (extract.py) bolted onto
``readStream → transform → writeStream`` with exactly-once file-sink
semantics via the streaming checkpoint.  ``trigger(availableNow=True)``
gives batch-equivalent runs over a landed corpus; continuous mode ingests a
growing documents directory.

Also provides a watermarked windowed aggregation over an event stream
(late-data-tolerant metrics), since a production extraction service wants
its lineage/metrics as a stream too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from .extract import INPUT_SCHEMA, extract_spans


def read_documents_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(INPUT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_path)


def extract_documents_stream(
    documents_stream: DataFrame,
    output_path: str,
    checkpoint_path: str,
    keep_markdown: bool = False,
    available_now: bool = True,
) -> DataStreamWriter:
    """documents stream → extraction → parquet sink (exactly-once via the
    streaming checkpoint; no salted repartition — micro-batches bound skew
    naturally and a stream shuffle would break file-source ordering)."""
    out = extract_spans(documents_stream, num_partitions=None, keep_markdown=keep_markdown)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer


def windowed_event_counts(
    events_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late events beyond the
    watermark are dropped; state is bounded — the 100 TB-safe shape for
    streaming metrics)."""
    # Watermarks require TIMESTAMP (not TIMESTAMP_NTZ); session tz is UTC.
    events = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
