"""Shared bucketed candidate-pair join with the degenerate-bucket skew guard.

Every bucketed near-duplicate candidate generator in this engine — MinHash
LSH bands (``dedup._pairs_from_buckets``), embedding hyperplane LSH
(``similarity.embedding_candidate_pairs``), and SimHash pigeonhole blocks
(``dedup.simhash_candidate_pairs``) — reduces to the same primitive: a
self-equi-join inside (bucket-key) groups, emitting ordered id pairs.  And
every one of them has the same 100 TB failure mode: a single degenerate
bucket (thousands of byte-identical boilerplate docs, zero/constant
embedding vectors, empty documents) makes the in-bucket join quadratic on
ONE key, which no amount of cluster parallelism survives.

This module is the one shared implementation of that join plus its guard,
so a new bucketed generator cannot ship without the cap again (the defect
class shipped three times before being factored here).

Guard semantics (``max_bucket_size``): buckets at or under the cap join
pairwise as usual; buckets over the cap route to a LINEAR star path — rows
are grouped by ``sig_col`` (a full-signature digest: byte-identical inputs
share it) and each row pairs only with its signature-group's minimum id.
Giant buckets are overwhelmingly signature-identical rows, so the star
captures them with n-1 pairs; signature-distinct strangers in a giant
bucket are dropped there (documented recall tradeoff — recoverable via the
other bands/tables/blocks).  Worst-case pairwise work per bucket is cap²,
independent of data skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _in_bucket_join(left: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Ordered-pair self-equi-join on the bucket key columns."""
    cond = F.col(f"l.{id_col}") < F.col(f"r.{id_col}")
    for k in key_cols:
        cond = (F.col(f"l.{k}") == F.col(f"r.{k}")) & cond
    return left.alias("l").join(left.alias("r"), cond)


def bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    id_col: str,
    sig_col: str | None = None,
    max_bucket_size: int | None = None,
    out_a: str = "id_a",
    out_b: str = "id_b",
    carry_cols: list[str] | None = None,
    distinct_pairs: bool = True,
) -> DataFrame:
    """Distinct ordered id pairs co-bucketed on ``key_cols``.

    ``buckets`` has one row per (id, bucket) assignment; a pair is emitted
    when two ids share ALL ``key_cols`` values (in any bucket row).  With
    ``max_bucket_size`` set, oversized buckets take the linear
    signature-star path instead of the quadratic self-join (see module
    docstring); ``sig_col`` (full-signature digest column, required when
    capped) keys the star groups.

    ``carry_cols`` rides per-id payload columns through the join as
    ``{col}_a`` / ``{col}_b`` output columns — the downstream verify
    stage (e.g. SimHash hamming) then needs NO join back to the
    signature table (two shuffles saved).  Contract: each carried column
    must be functionally determined by ``sig_col`` (true for signature
    components — the star path reads the rep's carry from its
    signature-identical group).

    Scale shape: one shuffle on the bucket key for the join (plus one
    window count over the same key when capped — same partitioning, reused
    by AQE); never all-pairs.

    ``distinct_pairs=False`` skips the final pair-dedup shuffle — correct
    ONLY for single-assignment generators where each id contributes
    exactly one bucket row (e.g. k-means cells), so the join cannot emit
    a pair twice; multi-bucket generators (LSH tables, SimHash blocks,
    MinHash bands) must keep the default, a pair colliding in two buckets
    would otherwise double-count downstream.
    """
    carry = carry_cols or []

    def _dedup(pairs):
        return pairs.distinct() if distinct_pairs else pairs

    def _sides(joined):
        return joined.select(
            F.col(f"l.{id_col}").alias(out_a),
            F.col(f"r.{id_col}").alias(out_b),
            *[F.col(f"l.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"r.{c}").alias(f"{c}_b") for c in carry],
        )

    if max_bucket_size is None:
        return _dedup(_sides(_in_bucket_join(buckets, key_cols, id_col)))
    if sig_col is None:
        raise ValueError(
            "max_bucket_size requires sig_col (full-signature digest) for the star path"
        )
    sized = buckets.withColumn(
        "bucket_n", F.count("*").over(Window.partitionBy(*key_cols))
    )
    small = sized.filter(F.col("bucket_n") <= max_bucket_size).drop("bucket_n", sig_col)
    small_pairs = _sides(_in_bucket_join(small, key_cols, id_col))
    big = sized.filter(F.col("bucket_n") > max_bucket_size)
    reps = big.groupBy(*key_cols, sig_col).agg(
        F.min(id_col).alias("rep"),
        # carried cols are sig-determined, so min == the group's value
        *[F.min(c).alias(f"__rep_{c}") for c in carry],
    )
    star_pairs = (
        big.join(reps, [*key_cols, sig_col])
        .filter(F.col(id_col) != F.col("rep"))
        .select(
            F.col("rep").alias(out_a),
            F.col(id_col).alias(out_b),
            *[F.col(f"__rep_{c}").alias(f"{c}_a") for c in carry],
            *[F.col(c).alias(f"{c}_b") for c in carry],
        )
    )
    return _dedup(small_pairs.unionByName(star_pairs))


def cross_bucket_pairs(
    left_buckets: DataFrame,
    right_buckets: DataFrame,
    key_cols: list[str],
    id_col: str,
    sig_col: str | None = None,
    max_bucket_size: int | None = None,
    out_a: str = "id_a",
    out_b: str = "id_b",
) -> DataFrame:
    """Distinct (left_id, right_id) pairs co-bucketed on ``key_cols``
    across TWO bucket tables — the incremental-dedup join (a new crawl
    increment against a persisted corpus index) where the quadratic risk
    is n_left × n_right per bucket.

    Guard semantics (``max_bucket_size``) — STRICTLY bounded, like
    :func:`bucket_pairs`' star path: buckets at or under the cap on
    BOTH sides cross-join fully (≤ cap² pairs).  A bucket oversized on
    EITHER side emits only (a) one rep-to-rep pair per shared
    ``sig_col`` signature group — each such pair is a true
    signature-identical duplicate, and there is at most one per group,
    so this is linear in the number of groups, never n_l × n_r — plus
    (b) a single bucket-representative pair (min id each side) so the
    band-level collision itself stays auditable.  Signature-distinct
    strangers inside an oversized bucket are dropped there (the same
    documented recall tradeoff as bucket_pairs, recoverable via the
    other bands); per-sig collapse — NOT per-sig rep retention — is
    what keeps a signature-DIVERSE hot bucket (n distinct templates
    sharing one band) from reverting to the quadratic join the guard
    exists to prevent."""
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    def _ids(joined):
        return (
            joined.filter(F.col(f"l.{id_col}") != F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias(out_a), F.col(f"r.{id_col}").alias(out_b)
            )
            .distinct()
        )

    if max_bucket_size is None:
        return _ids(left_buckets.alias("l").join(right_buckets.alias("r"), cond))
    if sig_col is None:
        raise ValueError(
            "max_bucket_size requires sig_col (full-signature digest) for the star path"
        )
    lcnt = left_buckets.groupBy(*key_cols).agg(F.count("*").alias("n_l"))
    rcnt = right_buckets.groupBy(*key_cols).agg(F.count("*").alias("n_r"))
    sizes = lcnt.join(rcnt, key_cols)  # only buckets present on BOTH sides pair
    small_k = sizes.filter(
        (F.col("n_l") <= max_bucket_size) & (F.col("n_r") <= max_bucket_size)
    ).select(*key_cols)
    big_k = sizes.filter(
        (F.col("n_l") > max_bucket_size) | (F.col("n_r") > max_bucket_size)
    ).select(*key_cols)

    ls = left_buckets.join(small_k, key_cols)
    rs = right_buckets.join(small_k, key_cols)
    small_pairs = _ids(ls.alias("l").join(rs.alias("r"), cond))

    lb = left_buckets.join(big_k, key_cols)
    rb = right_buckets.join(big_k, key_cols)
    l_sig = lb.groupBy(*key_cols, sig_col).agg(F.min(id_col).alias(id_col))
    r_sig = rb.groupBy(*key_cols, sig_col).agg(F.min(id_col).alias(id_col))
    sig_cond = cond & (F.col(f"l.{sig_col}") == F.col(f"r.{sig_col}"))
    sig_pairs = _ids(l_sig.alias("l").join(r_sig.alias("r"), sig_cond))
    l_rep = lb.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    r_rep = rb.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    rep_pairs = _ids(l_rep.alias("l").join(r_rep.alias("r"), cond))
    return small_pairs.unionByName(sig_pairs).unionByName(rep_pairs).distinct()


def capped_pairs_sql_ctes(
    src_cte: str,
    key_cols: list[str],
    id_col: str,
    sig_col: str,
    max_bucket_size: int,
    out_a: str,
    out_b: str,
) -> str:
    """DuckDB twin of the capped branch of :func:`bucket_pairs`, as a CTE
    chain ending in ``pairs({out_a}, {out_b})`` — splice after a
    ``{src_cte}({id_col}, *key_cols, {sig_col})`` CTE.  ONE generator
    for every capped oracle twin (MinHash bands, embedding LSH, SimHash
    blocks), so the SQL guard cannot drift from the shared Spark guard
    per-caller — the same lockstep rationale as the Spark-side
    factoring."""
    keys = ", ".join(key_cols)
    eq = " AND ".join(f"l.{k} = r.{k}" for k in key_cols)
    return f"""sized AS (
  SELECT *, count(*) OVER (PARTITION BY {keys}) AS bucket_n FROM {src_cte}
),
small AS (SELECT * FROM sized WHERE bucket_n <= {max_bucket_size}),
small_pairs AS (
  SELECT l.{id_col} AS {out_a}, r.{id_col} AS {out_b}
  FROM small l JOIN small r
    ON {eq} AND l.{id_col} < r.{id_col}
),
big AS (SELECT * FROM sized WHERE bucket_n > {max_bucket_size}),
reps AS (
  SELECT {keys}, {sig_col}, min({id_col}) AS rep
  FROM big GROUP BY {keys}, {sig_col}
),
star_pairs AS (
  SELECT r.rep AS {out_a}, g.{id_col} AS {out_b}
  FROM big g JOIN reps r USING ({keys}, {sig_col})
  WHERE g.{id_col} <> r.rep
),
pairs AS (
  SELECT DISTINCT {out_a}, {out_b} FROM (
    SELECT * FROM small_pairs UNION ALL SELECT * FROM star_pairs
  )
)"""
