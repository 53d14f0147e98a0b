"""Unit tests for the temporal relational operators (as-of join, binned
range join) — hand-computed expectations incl. tie and boundary cases."""

import datetime as dt

import pytest  # noqa: F401

from fetch_engines_spark.pipelines.relational import asof_join, range_join_binned


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_join_basic_inclusive_and_unmatched(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(30)), (2, 10, _ts(5)), (3, 20, _ts(30))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(101, 10, _ts(10), 5.0), (102, 10, _ts(30), 7.0), (103, 30, _ts(1), 9.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: (r.asof_event_id, r.asof_value)
        for r in asof_join(
            left, right, on="user_id", right_cols=["event_id", "value"], tiebreak="event_id"
        ).collect()
    }
    assert got[1] == (102, 7.0)  # equal timestamp matches (inclusive)
    assert got[2] == (None, None)  # nothing at-or-before
    assert got[3] == (None, None)  # no right rows for user 20 at all


def test_asof_join_tie_resolves_to_greatest_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(20))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(101, 10, _ts(10), 1.0), (105, 10, _ts(10), 2.0), (103, 10, _ts(10), 3.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = asof_join(
        left, right, on="user_id", right_cols=["event_id", "value"], tiebreak="event_id"
    ).collect()[0]
    assert row.asof_event_id == 105  # greatest event_id among the tied rows


def test_asof_join_requires_tiebreak(spark):
    df = spark.createDataFrame([(1, 1, _ts(0))], "event_id long, user_id long, ts timestamp")
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join(df, df, on="user_id")


def test_range_join_binned_equals_naive_join(spark):
    """The binned join must return EXACTLY the pairs of the naive
    key-join + range filter, including across-bin-boundary matches."""
    import itertools

    rows_l, rows_r = [], []
    eid = 0
    for u in range(5):
        for s in (0, 1700, 3599, 3600, 7200):
            rows_l.append((eid, u, _ts(0) + dt.timedelta(seconds=s + u))); eid += 1
        for s in (1, 1800, 3600, 3601, 5400, 9000):
            rows_r.append((eid, u, _ts(0) + dt.timedelta(seconds=s + u * 3))); eid += 1
    left = spark.createDataFrame(rows_l, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(rows_r, "event_id long, user_id long, ts timestamp")

    got = {
        (r["_lp"].event_id, r["_rp"].event_id)
        for r in range_join_binned(
            left, right, on="user_id", left_ts="ts", right_ts="ts", window_seconds=3600
        ).collect()
    }
    naive = set()
    for (le, lu, lt), (re_, ru, rt) in itertools.product(rows_l, rows_r):
        if lu == ru and lt < rt <= lt + dt.timedelta(seconds=3600):
            naive.add((le, re_))
    assert got == naive and naive  # identical, and non-trivially populated


def test_asof_join_matches_bruteforce_on_random_data(spark):
    """Differential: on pseudo-random keys/timestamps (with deliberate
    collisions), asof_join must equal the per-left-row brute-force
    definition: the right row with max ts <= left ts, greatest tiebreak
    id among ties."""
    import random

    rnd = random.Random(7)
    lefts = [
        (i, rnd.randrange(5), _ts(0) + dt.timedelta(seconds=rnd.randrange(50)))
        for i in range(60)
    ]
    rights = [
        (1000 + i, rnd.randrange(5), _ts(0) + dt.timedelta(seconds=rnd.randrange(50)), float(i))
        for i in range(40)
    ]
    left = spark.createDataFrame(lefts, "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        rights, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: r.asof_event_id
        for r in asof_join(
            left, right, on="user_id", right_cols=["event_id", "value"], tiebreak="event_id"
        ).collect()
    }
    for le, lu, lt in lefts:
        cands = [(rts, rid) for rid, ru, rts, _v in rights if ru == lu and rts <= lt]
        expect = max(cands)[1] if cands else None  # (ts, id) max = latest, then greatest id
        assert got[le] == expect, (le, got[le], expect)


def test_salted_join_equals_plain_join_under_skew(spark):
    """Salting must not change the join result — verified on a corpus
    where one key holds 80% of the left rows (the skew case salting is
    for), including join multiplicities."""
    from collections import Counter

    from fetch_engines_spark.pipelines.relational import salted_join

    left_rows = [(i, 7 if i % 10 < 8 else i % 5) for i in range(500)]
    right_rows = [(k, f"dim{k}") for k in range(10)] + [(7, "dim7-dup")]
    left = spark.createDataFrame(left_rows, "row_id long, k long")
    right = spark.createDataFrame(right_rows, "k2 long, label string")

    salted = Counter(
        (r.row_id, r.label)
        for r in salted_join(left, right, left_key="k", right_key="k2", salt_buckets=8).collect()
    )
    plain = Counter(
        (r.row_id, r.label) for r in left.join(right, left.k == right.k2).collect()
    )
    assert salted == plain and sum(plain.values()) > 500  # dup dim row doubles key 7


def test_kmv_estimate_accuracy_and_exact_below_k(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from fetch_engines_spark.pipelines.text import kmv_distinct

    rows = [(i, "big" if i < 5000 else "small", i % (2000 if i < 5000 else 10)) for i in range(6000)]
    df = spark.createDataFrame(rows, "i long, grp string, key long")
    got = {
        r.grp: r
        for r in kmv_distinct(df, "grp", "key", k=64, include_exact=True).collect()
    }
    assert got["small"].kmv_estimate == got["small"].n_exact == 10  # exact below k
    big = got["big"]
    assert big.n_exact == 2000
    assert abs(big.kmv_estimate - 2000) / 2000 < 0.35  # k=64 → ~12% stderr
    # production path (include_exact omitted): no exact-count column and no
    # countDistinct aggregate in the plan — only the k-row sketch runs
    prod = kmv_distinct(df, "grp", "key", k=64)
    assert "n_exact" not in prod.columns
    plan = prod._jdf.queryExecution().optimizedPlan().toString()
    assert "count(distinct" not in plan.lower()
    est = {r.grp: r.kmv_estimate for r in prod.collect()}
    assert est["small"] == 10


def test_range_join_binned_no_duplicate_pairs(spark):
    left = spark.createDataFrame([(1, 10, _ts(0))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame([(2, 10, _ts(30))], "event_id long, user_id long, ts timestamp")
    out = range_join_binned(left, right, on="user_id", left_ts="ts", right_ts="ts", window_seconds=3600)
    assert out.count() == 1
