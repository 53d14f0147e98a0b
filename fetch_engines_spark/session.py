"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the extraction workload (BASELINE.json north_rule):
- Arrow batching on, with a bounded ``maxRecordsPerBatch`` so batches of
  giant documents fit executor memory (skew knob named by BASELINE.json).
- AQE on (coalescing + skew-join splitting) for the verification/resume joins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Documents average ~10-100 KB of HTML; 256 rows/batch keeps an Arrow batch
# in the low tens of MB even with a skewed tail of multi-MB documents.
DEFAULT_ARROW_BATCH = 256


def get_spark(
    app_name: str = "fetch-engines-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = DEFAULT_ARROW_BATCH,
    ship_package: bool = True,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Shuffle/spill to tmpfs when available: on this single-node sandbox
        # the disk becomes the serial bottleneck for the repartition shuffle;
        # a real cluster would use fast local SSDs (override with
        # SPARK_GRAFT_LOCAL_DIR).
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    spark = builder.getOrCreate()
    if ship_package:
        # Workers may run with a different cwd/sys.path than the driver;
        # ship the package zip so the extraction UDF always unpickles
        # (same mechanism as spark-submit --py-files).
        from .packaging import ship_package as _ship

        _ship(spark)
    return spark
