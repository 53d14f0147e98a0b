"""Temporal relational operators Spark lacks natively: as-of join and
binned range join.

The reference engine has no relational layer at all (SURVEY.md §2 — no
joins anywhere in src/); these operators exist for the training-data
pipeline around it: sessionization, attribution ("which purchase preceded
this view"), and time-window correlation over event streams at 10^12-row
scale, where the naive formulations (per-row subqueries, non-equi joins)
are not executable.

Both operators are pure native DataFrame compositions — no UDFs — with
deterministic tie-breaking so the DuckDB oracle twins can verify values
exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, the LATEST right row of the same ``on`` key with
    right_ts <= left_ts (inclusive) — the as-of join of kdb/pandas/DuckDB,
    built from Spark primitives.

    Shape: tag and union both inputs, ONE shuffle on the key, and a
    running ``last(payload, ignorenulls)`` window in (ts, tag, tiebreak)
    order — the same merge-scan a native as-of implementation performs,
    O(n log n) per key and never a per-row subquery or non-equi join.
    Right rows sort before left rows at equal timestamps (inclusive
    semantics); ties among right rows at the same (key, ts) resolve to
    the greatest ``tiebreak`` value (required for engine-portable
    determinism — pass a unique column like the event id).

    Returns all left columns plus each requested right column as
    ``{prefix}{col}`` (null where no right row precedes the left row).

    NULL semantics, pinned on both engines: right rows with a NULL key
    or NULL timestamp are EXCLUDED (a join never matches NULL=NULL, and
    an un-timestamped row has no place in the merge order — Spark sorts
    nulls FIRST and DuckDB LAST, so leaving them in would also diverge
    between the engines); left rows with a NULL key simply match
    nothing (their partition holds no right rows).
    """
    right_cols = right_cols or []
    if tiebreak is None:
        raise ValueError("asof_join needs a unique right-side tiebreak column")
    payload_cols = list(dict.fromkeys([*right_cols, right_ts, tiebreak]))
    right = right.filter(F.col(on).isNotNull() & F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rp"),
    ).withColumn("_tag", F.lit(0))
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_rp"].dataType).alias("_rp"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
    )
    unioned = r.withColumn("_lp", F.lit(None).cast(l.schema["_lp"].dataType)).unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc_nulls_last("_ts"), F.asc("_tag"), F.asc_nulls_last("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    out_cols = [F.col(f"_lp.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols]
    return matched.select(*out_cols)


def asof_join_oracle_sql(
    left_sql: str,
    right_sql: str,
    on: str,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> str:
    """DuckDB twin mirroring the union+window construction (same inclusive
    semantics, same greatest-tiebreak rule — portable by construction,
    unlike native ASOF JOIN whose tie choice is unspecified)."""
    payload_cols = list(dict.fromkeys([*right_cols, right_ts, tiebreak]))
    r_payload = ", ".join(f"{c} := {c}" for c in payload_cols)
    l_payload = ", ".join(f"{c} := {c}" for c in left_cols)
    out_right = ", ".join(f"_m.{c} AS {prefix}{c}" for c in payload_cols)
    return f"""
WITH l_src AS ({left_sql}),
r_src AS (SELECT * FROM ({right_sql}) WHERE {on} IS NOT NULL AND {right_ts} IS NOT NULL),
u AS (
  SELECT {on} AS _k, {right_ts} AS _ts, {tiebreak} AS _tb, 0 AS _tag,
         struct_pack({r_payload}) AS _rp, NULL AS _lp
  FROM r_src
  UNION ALL BY NAME
  SELECT {on} AS _k, {left_ts} AS _ts, NULL AS _tb, 1 AS _tag,
         NULL AS _rp, struct_pack({l_payload}) AS _lp
  FROM l_src
),
m AS (
  SELECT *, last_value(_rp IGNORE NULLS) OVER (
    PARTITION BY _k ORDER BY _ts ASC NULLS LAST, _tag ASC, _tb ASC NULLS LAST
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS _m
  FROM u
)
SELECT {", ".join(f"_lp.{c} AS {c}" for c in left_cols)}, {out_right}
FROM m WHERE _tag = 1
"""


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: the big (left) side gets a deterministic
    per-row salt, the small (right) side is replicated across all
    ``salt_buckets`` salts, and the join runs on (key, salt) — a hot key's
    rows spread over ``salt_buckets`` reducers instead of pinning one.

    The salt derives from xxhash64 of the whole left row (content-
    deterministic — stable across retries, unlike
    monotonically_increasing_id), so the output is exactly the plain
    join's output; only row placement changes.  Cost: right side ×S —
    the standard trade for dim-table joins whose fact side has hot keys
    AQE's skew handling can't fully split (e.g. a single key larger than
    any split threshold)."""
    l = left.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt_buckets)).cast("int"),
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return (
        l.join(r, (l[left_key] == r[right_key]) & (l["_salt"] == r["_salt"]))
        .drop("_salt")
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    bin_seconds: int | None = None,
) -> DataFrame:
    """All (left, right) pairs with the same key and right_ts in
    (left_ts, left_ts + window_seconds] — the interval/range join.

    Scale shape: a plain key-equi-join explodes on hot keys (a user with
    m lefts and n rights costs m*n BEFORE the range filter).  Binning
    adds the time bin to the join key: each left row joins only the 2–3
    bins its window can reach, so per-key fan-out is bounded by actual
    temporal locality, not key cardinality — the standard interval-join
    strategy of streaming engines.  Pure native: explode over a 2-element
    bin range + one equi-join on (key, bin) + exact range filter.
    """
    bin_seconds = bin_seconds or window_seconds
    n_bins = -(-window_seconds // bin_seconds)  # bins a window can span
    # epoch as double: microsecond-exact (epoch*1e6 < 2^53), unlike
    # unix_timestamp which truncates to whole seconds.  NTZ needs the
    # intermediate timestamp cast; a constant session-tz offset cancels
    # in every bin and range comparison (only differences matter).
    def _epoch(c):
        return F.col(c).cast("timestamp").cast("double")

    l = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_lp"),
        F.col(on).alias("_k"),
        _epoch(left_ts).alias("_lts"),
    ).select(
        "_lp",
        "_k",
        "_lts",
        F.explode(
            F.sequence(
                F.floor(F.col("_lts") / bin_seconds).cast("long"),
                F.floor(F.col("_lts") / bin_seconds).cast("long") + n_bins,
            )
        ).alias("_bin"),
    )
    r = right.select(
        F.struct(*[F.col(c) for c in right.columns]).alias("_rp"),
        F.col(on).alias("_k"),
        _epoch(right_ts).alias("_rts"),
    ).withColumn("_bin", F.floor(F.col("_rts") / bin_seconds).cast("long"))
    return (
        l.join(r, ["_k", "_bin"])
        .filter(
            (F.col("_rts") > F.col("_lts"))
            & (F.col("_rts") <= F.col("_lts") + window_seconds)
        )
        .select("_lp", "_rp")
    )
