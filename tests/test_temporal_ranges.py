"""Unit edge cases for the as-of join, bucketed range join, KMV sketch, and
packing operators — hand-built frames with hand-computed expectations
(the catalog queries cover the at-scale oracle diff)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.extensions.curation import pack_sequences
from kafka_sink_spark.extensions.sketch import kmv_distinct
from kafka_sink_spark.operators.ranges import range_join_bucketed
from kafka_sink_spark.operators.temporal import asof_join


def test_asof_empty_right_side_yields_nulls(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "k int, t int")
    right = spark.createDataFrame([], "k int, t int, px double")
    out = asof_join(left, right, ["k"], "t", {"px": "px"}).orderBy("k").collect()
    assert [(r.k, r.t, r.px) for r in out] == [(1, 10, None), (2, 20, None)]


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame([(1, 10)], "k int, t int")
    # two right rows at exactly t=10: greatest tiebreak (id) must win,
    # and the equal-timestamp row must match (inclusive as-of)
    right = spark.createDataFrame(
        [(1, 10, 7, 1.0), (1, 10, 9, 2.0), (1, 11, 99, 3.0)],
        "k int, t int, id int, px double",
    )
    out = asof_join(
        left, right, ["k"], "t", {"px": "px", "id": "mid"}, tiebreak="id"
    ).collect()
    assert [(r.px, r.mid) for r in out] == [(2.0, 9)]


def test_asof_payload_columns_come_from_same_row(spark):
    # the later right row carries a NULL payload field; a per-column
    # last(ignorenulls) would wrongly mix rows — the struct must not
    left = spark.createDataFrame([(1, 30)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 10, 1.0, "a"), (1, 20, None, "b")], "k int, t int, px double, tag string"
    )
    out = asof_join(left, right, ["k"], "t", {"px": "px", "tag": "tag"}).collect()
    assert [(r.px, r.tag) for r in out] == [(None, "b")]


def test_range_join_boundaries(spark):
    # interval [10, 20): 10 is in, 20 is out; bucket width smaller than,
    # equal to, and larger than the interval must all agree
    points = spark.createDataFrame(
        [(0, 9.999), (1, 10.0), (2, 19.999), (3, 20.0)], "pid int, v double"
    )
    intervals = spark.createDataFrame([(100, 10.0, 20.0)], "iid int, lo double, hi double")
    for w in (4, 10, 64):
        got = sorted(
            r.pid
            for r in range_join_bucketed(
                points, "v", intervals, "lo", "hi", bucket_width=w
            ).collect()
        )
        assert got == [1, 2], (w, got)


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame([("a", str(i % 10)) for i in range(100)], "g string, x string")
    out = kmv_distinct(df, ["g"], F.col("x"), k=64).collect()
    assert [(r.n_est, r.n_exact) for r in out] == [(10, 10)]


def test_kmv_estimate_within_tolerance(spark):
    # 5000 distinct items, k=256 -> ~1/sqrt(k) ≈ 6% expected rel. error
    df = spark.createDataFrame([("a", str(i)) for i in range(5000)], "g string, x string")
    r = kmv_distinct(df, ["g"], F.col("x"), k=256).collect()[0]
    assert r.n_exact == 5000
    assert abs(r.n_est - 5000) / 5000 < 0.2, r.n_est


def test_kmv_sketch_path_matches_exact_path(spark):
    """The production path (with_exact=False, WindowGroupLimit, O(k) state)
    must produce the SAME estimate as the exact-verification path — both
    above and below the k threshold."""
    df = spark.createDataFrame(
        [("big", str(i)) for i in range(5000)]
        + [("small", str(i % 10)) for i in range(100)],
        "g string, x string",
    )
    exact = {
        r.g: r.n_est
        for r in kmv_distinct(df, ["g"], F.col("x"), k=256, with_exact=True).collect()
    }
    sketch_only = {
        r.g: r.n_est
        for r in kmv_distinct(df, ["g"], F.col("x"), k=256, with_exact=False).collect()
    }
    assert sketch_only == exact


def test_kmv_per_row_prereduction_matches_flat_path(spark):
    """Bottom-k of the union of per-row bottom-k distinct hashes == bottom-k
    of all items: the pre-reduced estimate must equal the flat-explode
    estimate, both when group distinct >> k and when it is below k."""
    from kafka_sink_spark.extensions.sketch import kmv_bottom_k_array

    rows = [("big", [f"w{i}-{j}" for j in range(60)]) for i in range(40)]
    rows += [("small", [f"s{i % 4}" for i in range(10)]) for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, items array<string>")
    flat = df.select("g", F.explode("items").alias("x"))
    expected = {
        r.g: r.n_est
        for r in kmv_distinct(flat, ["g"], F.col("x"), k=64, with_exact=False).collect()
    }
    reduced = df.select(
        "g", F.explode(kmv_bottom_k_array(F.col("items"), k=64)).alias("h")
    )
    got = {
        r.g: r.n_est
        for r in kmv_distinct(
            reduced, ["g"], F.col("h"), k=64, with_exact=False, items_are_hashes=True
        ).collect()
    }
    assert got == expected


def test_pack_sequences_straddles_cuts(spark):
    df = spark.createDataFrame(
        [("a", 1, 6), ("a", 2, 6), ("a", 3, 2)], "g string, i int, n int"
    )
    out = {
        r.i: (r.shard_id, r.cum_units)
        for r in pack_sequences(df, ["g"], "i", F.col("n"), budget=10).collect()
    }
    # row2 starts at offset 6 -> chunk 0 (it straddles the cut at 10);
    # row3 starts at offset 12 -> chunk 1
    assert out == {1: (0, 6), 2: (0, 12), 3: (1, 14)}
