"""Checkpoint / lineage / resume plumbing (north_rule requirement).

The reference's in-memory URL-keyed TTL cache (reference:
src/PlaywrightEngine.ts:249-260, 484-492) becomes, at batch scale, a
checkpoint ledger table: work is split into deterministic doc_id-hash
buckets; each completed bucket appends a ledger row with row-count/byte
metrics; resume anti-joins the input against completed buckets so failed
runs never recompute finished work.

The sink format is pluggable (``table_format``): this sandbox ships no
Iceberg runtime, so parquet is the default; with iceberg-spark-runtime on
the classpath the same layout writes as Iceberg tables (the ledger/resume
logic is format-agnostic).

Layout under ``<root>/``:
- ``outputs/``           extracted spans, parquet, partitioned by bucket
- ``partition_ledger/``  one row per completed (run_id, bucket)
- ``metrics/``           per-Spark-partition lineage rows per wave
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from contextlib import contextmanager

from .extract import extract_spans


@contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, prev)

LEDGER_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("bucket", IntegerType()),
        StructField("n_buckets", IntegerType()),
        StructField("doc_count", LongType()),
        StructField("byte_count", LongType()),
        StructField("wall_ms", LongType()),
        StructField("status", StringType()),
        StructField("updated_at", LongType()),  # epoch millis
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("bucket", IntegerType()),
        StructField("partition_id", IntegerType()),
        StructField("doc_count", LongType()),
        StructField("byte_count", LongType()),
        StructField("error_count", LongType()),
        StructField("wall_us_sum", LongType()),
    ]
)


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))


def completed_buckets(
    spark: SparkSession,
    root: str,
    run_id: str,
    table_format: str = "parquet",
    n_buckets: int | None = None,
) -> DataFrame:
    """Buckets already marked done for this run (empty df if no ledger yet).

    When ``n_buckets`` is given, fail fast if the ledger recorded a
    different bucketing for this run_id: bucket ids from a different
    n_buckets denote different document sets, so silently reusing them
    would skip or double-process documents.
    """
    try:
        ledger = spark.read.format(table_format).load(f"{root}/partition_ledger")
    except Exception:
        return spark.createDataFrame([], "bucket int")
    mine = ledger.filter((F.col("run_id") == run_id) & (F.col("status") == "done"))
    if n_buckets is not None and "n_buckets" in ledger.columns:
        mismatched = (
            mine.filter(F.col("n_buckets").isNotNull() & (F.col("n_buckets") != n_buckets))
            .limit(1)
            .count()
        )
        if mismatched:
            raise ValueError(
                f"run_id={run_id!r} has ledger rows with a different n_buckets "
                f"than the requested {n_buckets}; resume with the original "
                f"n_buckets or use a new run_id"
            )
    return mine.select("bucket").distinct()


def run_extraction_job(
    spark: SparkSession,
    documents: DataFrame,
    root: str,
    run_id: str,
    n_buckets: int = 8,
    num_partitions: int | None = None,
    keep_markdown: bool = False,
    table_format: str = "parquet",
    max_content_length: int | None = None,
) -> dict:
    """Resumable extraction: bucket the corpus, anti-join completed buckets,
    process remaining buckets in waves, append outputs + ledger + metrics.

    Returns summary dict {processed_buckets, skipped_buckets, doc_count}.
    """
    docs = with_bucket(documents, n_buckets)
    done = completed_buckets(spark, root, run_id, table_format, n_buckets=n_buckets)
    done_set = {r.bucket for r in done.collect()}  # tiny: one int per bucket
    todo = sorted(set(range(n_buckets)) - done_set)

    processed = 0
    total_docs = 0
    for bucket in todo:
        t0 = time.time()
        chunk = docs.filter(F.col("bucket") == bucket).drop("bucket")
        if chunk.isEmpty():
            # Empty buckets write no parquet files, so the read-back below
            # would fail (UNABLE_TO_INFER_SCHEMA on a fresh root); ledger
            # them as done with zero counts and move on.
            wall_ms = int((time.time() - t0) * 1000)
            spark.createDataFrame(
                [(run_id, bucket, n_buckets, 0, 0, wall_ms, "done", int(time.time() * 1000))],
                LEDGER_SCHEMA,
            ).write.mode("append").format(table_format).save(f"{root}/partition_ledger")
            processed += 1
            continue
        out = extract_spans(
            chunk,
            num_partitions=num_partitions,
            keep_markdown=keep_markdown,
            max_content_length=max_content_length,
        )
        out = (
            out.withColumn("run_id", F.lit(run_id))
            .withColumn("bucket", F.lit(bucket))
            .withColumn("partition_id", F.spark_partition_id())
        )
        # dynamic partition overwrite makes bucket writes idempotent: if a
        # run crashed AFTER writing outputs but BEFORE the ledger append,
        # the rerun replaces that (run_id, bucket) partition instead of
        # appending duplicates; other runs' outputs are untouched
        with _dynamic_partition_overwrite(spark):
            out.write.mode("overwrite").partitionBy("run_id", "bucket").format(
                table_format
            ).save(f"{root}/outputs")

        written = (
            spark.read.format(table_format)
            .load(f"{root}/outputs")
            .filter((F.col("bucket") == bucket) & (F.col("run_id") == run_id))
        )
        metrics = (
            written.groupBy("run_id", "bucket", "partition_id")
            .agg(
                F.count("*").alias("doc_count"),
                F.sum("out_bytes").alias("byte_count"),
                F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_count"),
                F.sum("wall_us").alias("wall_us_sum"),
            )
            .select([f.name for f in METRICS_SCHEMA.fields])
        )
        # same idempotence as outputs: a crash after this write but before
        # the ledger append must not double-count lineage on rerun, so the
        # (run_id, bucket) metrics partition is overwritten, not appended
        with _dynamic_partition_overwrite(spark):
            metrics.write.mode("overwrite").partitionBy("run_id", "bucket").format(
                table_format
            ).save(f"{root}/metrics")

        # ledger totals come from the just-written METRICS partition (one
        # tiny row per task partition) — re-aggregating `written` here
        # cost a second full read of the bucket's output per wave
        stats = (
            spark.read.format(table_format)
            .load(f"{root}/metrics")
            .filter((F.col("bucket") == bucket) & (F.col("run_id") == run_id))
            .agg(
                F.coalesce(F.sum("doc_count"), F.lit(0)).alias("n"),
                F.coalesce(F.sum("byte_count"), F.lit(0)).alias("b"),
            )
            .collect()[0]
        )
        wall_ms = int((time.time() - t0) * 1000)
        ledger_row = spark.createDataFrame(
            [(run_id, bucket, n_buckets, stats.n, stats.b, wall_ms, "done", int(time.time() * 1000))],
            LEDGER_SCHEMA,
        )
        ledger_row.write.mode("append").format(table_format).save(f"{root}/partition_ledger")
        processed += 1
        total_docs += stats.n

    return {
        "processed_buckets": processed,
        "skipped_buckets": len(done_set),
        "doc_count": total_docs,
    }
