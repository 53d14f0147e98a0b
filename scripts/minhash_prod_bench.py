"""Production-parameter MinHash throughput: signatures + LSH banding at
128 permutations / 16 bands over a 256k-doc corpus (sf0.1 documents
replicated with a replica-suffixed token so texts stay distinct).

Times the signature+banding stage (the hash-bound part that dominates at
10^12 docs); candidate-join cost is corpus-similarity-dependent and is
gated separately (adversarial fixture + bucket cap).

Compares the affine fast path (one md5 per shingle + k affine
permutations) against the naive k-independent-md5 construction to justify
the production design.

Run: python scripts/minhash_prod_bench.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 256_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main() -> None:
    from pyspark.sql import functions as F

    from fetch_engines_spark.pipelines.dedup import (
        minhash_lsh_buckets,
        minhash_lsh_buckets_fast,
    )
    from fetch_engines_spark.session import get_spark

    spark = get_spark(
        app_name="minhash-prod-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base.count()
    replicas = max(1, N_DOCS // n_base)
    idx = spark.range(replicas).select(F.col("id").alias("replica"))
    docs = (
        base.crossJoin(idx)
        .select(
            F.concat_ws("#", F.col("doc_id").cast("string"), "replica").alias("doc_id"),
            # replica-suffixed token keeps replicated texts distinct so the
            # bucket structure resembles a real (mostly-unique) corpus
            F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("replica"))).alias("text"),
        )
        .repartition(CPUS * 2)
        .persist()
    )
    n = docs.count()

    results = {}
    for name, fn, kwargs in [
        ("fast_affine_128x16", minhash_lsh_buckets_fast, dict(num_hashes=128, band_size=8)),
        ("naive_md5_128x16", minhash_lsh_buckets, dict(num_hashes=128, band_size=8)),
    ]:
        fn(docs.limit(2000), **kwargs).count()  # codegen warmup
        t0 = time.time()
        cnt = fn(docs, **kwargs).count()
        wall = time.time() - t0
        results[name] = (wall, cnt)
        print(
            f"{name}: {n} docs -> {cnt} bucket rows in {wall:.1f}s "
            f"({n / wall:,.0f} docs/s)"
        )

    fast, naive = results["fast_affine_128x16"][0], results["naive_md5_128x16"][0]
    print(f"affine speedup vs naive k-md5: {naive / fast:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
