"""Structured Streaming tests: streaming extraction equals batch extraction;
watermarked windowed aggregation over the events table."""

import pytest
from pyspark.sql import functions as F

from fetch_engines_spark.extract import INPUT_SCHEMA, extract_spans
from fetch_engines_spark.fixtures import fixture_document_rows
from fetch_engines_spark.streaming import (
    extract_documents_stream,
    read_documents_stream,
    windowed_event_counts,
)


def test_streaming_extraction_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.createDataFrame(fixture_document_rows(), INPUT_SCHEMA)
    docs.write.parquet(input_dir)

    stream = read_documents_stream(spark, input_dir, max_files_per_trigger=2)
    q = extract_documents_stream(stream, out_dir, ckpt, keep_markdown=True).start()
    q.awaitTermination(timeout=120)

    streamed = {r.doc_id: r.markdown for r in spark.read.parquet(out_dir).collect()}
    batch = {r.doc_id: r.markdown for r in extract_spans(docs, keep_markdown=True).collect()}
    assert streamed == batch


def test_streaming_extraction_is_incremental(spark, tmp_path):
    """Restarting the stream after new files arrive processes ONLY the new
    files (exactly-once via the checkpoint)."""
    input_dir = tmp_path / "in"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    input_dir.mkdir()

    rows = fixture_document_rows()
    docs1 = spark.createDataFrame(rows[:10], INPUT_SCHEMA)
    docs1.coalesce(1).write.mode("append").parquet(str(input_dir))

    q = extract_documents_stream(
        read_documents_stream(spark, str(input_dir)), out_dir, ckpt
    ).start()
    q.awaitTermination(timeout=120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 10

    docs2 = spark.createDataFrame(rows[10:], INPUT_SCHEMA)
    docs2.coalesce(1).write.mode("append").parquet(str(input_dir))

    q = extract_documents_stream(
        read_documents_stream(spark, str(input_dir)), out_dir, ckpt
    ).start()
    q.awaitTermination(timeout=120)
    out = spark.read.parquet(out_dir)
    assert out.count() == len(rows)
    # no duplicates: every doc exactly once
    assert out.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_windowed_event_counts_with_watermark(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out_dir = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt2")

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(events_dir)

    stream = spark.readStream.schema(ev.schema).parquet(events_dir)
    agg = windowed_event_counts(stream, window_duration="1 day", watermark_delay="1 hour")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)

    got = spark.read.parquet(out_dir)
    # batch oracle over the same data
    expected = (
        ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .count()
    )
    # append mode emits only windows sealed by the watermark; the final
    # window may be open, so streamed rows ≤ batch windows and > 0
    assert 0 < got.count() <= expected
    # sealed windows must match the batch aggregation exactly
    batch = {
        (str(r["window"].start), r.event_type): r.n_events
        for r in ev.groupBy(F.window("ts", "1 day"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    for r in got.collect():
        assert batch[(str(r.window_start), r.event_type)] == r.n_events


def test_stateful_sessionize_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful op: completed sessions (in-batch gaps) are emitted;
    the open tail session stays in state."""
    import datetime as dt

    events_dir = str(tmp_path / "sess_events")
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    # user 1: two sessions separated by a 2h gap, tail session open
    for mins in (0, 5, 10, 130, 135):
        rows.append((eid, t0 + dt.timedelta(minutes=mins), 1, "click", 1.0, "{}"))
        eid += 1
    # user 2: one open session only
    for mins in (0, 1):
        rows.append((eid, t0 + dt.timedelta(minutes=mins), 2, "view", 1.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    ev.write.parquet(events_dir)

    from fetch_engines_spark.streaming import stateful_sessionize

    stream = spark.readStream.schema(ev.schema).parquet(events_dir)
    q = (
        stateful_sessionize(stream, gap_seconds=1800, idle_timeout=False)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(timeout=180), "query did not terminate"
    got = spark.read.parquet(out_dir).collect()
    # exactly one COMPLETED session: user 1's first (3 events, 10 min span)
    assert len(got) == 1
    s = got[0]
    assert s.user_id == 1 and s.n_events == 3
    assert (s.session_end - s.session_start).total_seconds() == 600


def test_streaming_dedup_matches_batch_distinct(spark, tmp_path):
    """State-backed streaming dropDuplicates across micro-batches: a dup
    arriving in a LATER batch is dropped; survivors = batch DISTINCT."""
    import pyspark.sql.functions as F

    from fetch_engines_spark.streaming import dedup_documents_stream

    rows1 = [("a", "same text", None), ("b", "other text", None)]
    rows2 = [("c", "same text", None), ("d", "third text", None)]  # c dups a
    schema = "doc_id string, text string, family string"
    spark.createDataFrame(rows1, schema).write.parquet(str(tmp_path / "in" / "f1"))
    spark.createDataFrame(rows2, schema).write.parquet(str(tmp_path / "in" / "f2"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(tmp_path / "in"))
    )
    q = (
        dedup_documents_stream(stream, text_from_spans=False)
        .select("content_hash")
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = {r.content_hash for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    want = {
        r.h
        for r in spark.createDataFrame(rows1 + rows2, schema)
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) == 3


def test_stream_dedup_contentless_docs_each_survive(spark, tmp_path):
    """Review finding: docs with null/empty spans all hashed to md5('')
    and dropDuplicates kept ONE of them — 99 distinct failed docs
    silently vanished.  Contentless docs now key on their own doc_id."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType)

    from fetch_engines_spark.extract import SPAN_TYPE
    from fetch_engines_spark.streaming import dedup_documents_stream

    schema = StructType([
        StructField("doc_id", StringType()),
        StructField("spans", ArrayType(SPAN_TYPE)),
    ])
    span = {"kind": "html", "text": "<p>same</p>", "media_ref": None, "offset": 0}
    rows = (
        [(f"err{i}", None) for i in range(5)]
        + [(f"empty{i}", []) for i in range(5)]
        + [("dup-a", [span]), ("dup-b", [span])]
    )
    src = str(tmp_path / "docs")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        dedup_documents_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout=120)
    got = {r.doc_id for r in spark.read.parquet(out_dir).collect()}
    # all 10 contentless docs survive; the genuine dup pair collapses to 1
    assert {f"err{i}" for i in range(5)} <= got
    assert {f"empty{i}" for i in range(5)} <= got
    assert len(got & {"dup-a", "dup-b"}) == 1
    assert len(got) == 11


def test_windowed_counts_large_values_not_nulled(spark, tmp_path):
    """Review finding: the decimal(18,6) cast NULLED |value| >= 1e12 and
    silently excluded it from sum_value."""
    import datetime

    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType, TimestampType)

    from fetch_engines_spark.streaming import windowed_event_counts

    schema = StructType([
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ])
    t = datetime.datetime(2024, 1, 1, 6, 0, 0)
    rows = [(t, "big", 5.0e12), (t, "big", 2.5), (t + datetime.timedelta(days=3), "late", 1.0)]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    out_dir, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        windowed_event_counts(stream, window_duration="1 day", watermark_delay="1 hour")
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout=120)
    got = {r.event_type: r for r in spark.read.parquet(out_dir).collect()}
    assert got["big"].n_events == 2
    assert got["big"].sum_value == 5.0e12 + 2.5  # not nulled, not partial


def test_sessionize_null_timestamps_do_not_poison_state(spark, tmp_path):
    """Review finding: a null ts became NaT -> int64-min and poisoned the
    per-key session state (sessions in year 1677)."""
    import datetime

    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType)

    from fetch_engines_spark.streaming import stateful_sessionize

    schema = StructType([
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ])
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    # TWO batches (maxFilesPerTrigger=1): the null arrives in batch 1, so
    # a poisoned last_us would PERSIST into state and batch 2's first
    # event would close a garbage session (start/end in year 1677)
    src = str(tmp_path / "ev")
    spark.createDataFrame([(7, t0), (7, None)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(
        [(7, t0 + datetime.timedelta(minutes=5)),
         (7, t0 + datetime.timedelta(hours=3))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        stateful_sessionize(stream, gap_seconds=1800, idle_timeout=False)
        .writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(timeout=120)
    got = sorted(spark.read.parquet(out_dir).collect(), key=lambda r: r.session_start)
    # one sane session closed by the 3-hour gap; NO year-1677 garbage
    # session from the poisoned batch-1 state
    assert len(got) == 1, [str(r.session_start) for r in got]
    r = got[0]
    assert r.n_events == 2
    assert str(r.session_start).startswith("2024-01-01 10:00")
    assert str(r.session_end).startswith("2024-01-01 10:05")
