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


def stateful_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    idle_timeout: bool = True,
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` (arbitrary per-key state across
    micro-batches — the shape Structured Streaming's built-in windows can't
    express).

    State per user: (session_start, last_ts, n_events).  A gap >
    ``gap_seconds`` closes the running session and emits it; the state
    survives micro-batch boundaries, and (with ``idle_timeout``) a
    processing-time timeout flushes idle users.  Pass
    ``idle_timeout=False`` for availableNow/batch-style runs — a pending
    timeout keeps the query alive past the available data.
    Output: (user_id, session_start, session_end, n_events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        sessions: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                sessions.append((user_id, start_us, last_us, n))
                state.remove()
        else:
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = None
                n = 0
            ts_all = []
            for pdf in pdfs:
                ts_all.append(pd.to_datetime(pdf["ts"]))
            ts = pd.concat(ts_all).sort_values() if ts_all else pd.Series(dtype="datetime64[ns]")
            # a null ts becomes NaT, whose .value is int64-min — one such
            # event would poison the persisted per-key state (sessions in
            # year 1677); drop nulls, they carry no ordering information
            ts = ts.dropna()
            for t in ts:
                t_us = int(t.value // 1000)
                if last_us is not None and t_us - last_us > gap_seconds * 1_000_000:
                    sessions.append((user_id, start_us, last_us, n))
                    start_us, n = t_us, 0
                if start_us is None:
                    start_us = t_us
                last_us = t_us
                n += 1
            if last_us is not None:
                state.update((start_us, last_us, n))
                if idle_timeout:
                    state.setTimeoutDuration(gap_seconds * 1000)
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [s[0] for s in sessions],
                    "session_start": [pd.Timestamp(s[1] * 1000, unit="ns") for s in sessions],
                    "session_end": [pd.Timestamp(s[2] * 1000, unit="ns") for s in sessions],
                    "n_events": [s[3] for s in sessions],
                }
            )

    events = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout if idle_timeout else GroupStateTimeout.NoTimeout
        ),
    )


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
            # decimal(30,6): |value| up to 1e24 survives the cast —
            # decimal(18,6) silently NULLED values >= 1e12, excluding
            # them from the sum with no error
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_documents_stream(
    documents_stream: DataFrame,
    text_from_spans: bool = True,
) -> DataFrame:
    """Streaming exact dedup: content-hash dropDuplicates over the document
    stream (state-backed across micro-batches — a re-crawled page seen in a
    later batch is dropped, which batch dedup jobs can't do incrementally).

    At corpus scale the dedup state must be bounded: pair with
    ``withWatermark`` on an event-time column when one exists so old state
    ages out; the fixture corpus replay is availableNow (finite), so the
    unbounded variant is exact.  Output: one row per distinct content hash
    (deterministic regardless of which duplicate micro-batch order wins).
    """
    if text_from_spans:
        text = F.concat_ws(
            "\x1f",
            F.transform(
                F.col("spans"), lambda s: F.coalesce(s["text"], F.lit(""))
            ),
        )
        empty = F.col("spans").isNull() | (F.size("spans") == 0)
    else:
        text = F.col("text")
        empty = F.col("text").isNull()
    # contentless docs (null/empty spans — e.g. upstream error rows) must
    # each survive: hashing them all to md5("")/NULL would dedup 100
    # distinct failed docs into one and corrupt lineage accounting, so
    # their "hash" is their own doc_id
    content_hash = F.when(
        empty, F.concat(F.lit("empty:"), F.col("doc_id").cast("string"))
    ).otherwise(F.md5(text))
    hashed = documents_stream.withColumn("content_hash", content_hash)
    return hashed.dropDuplicates(["content_hash"])
