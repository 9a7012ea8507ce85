"""Behavior + plan invariants for the round-8h load/QA wave
(plans/analytics_loadqa.py): return-rate screen, centroid shift,
peak-to-mean.  Cross-engine equality is covered by test_entry_oracle /
tools/driver_check."""

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# parts_return_rate_by_brand
# ---------------------------------------------------------------------------


def test_return_rate_matches_reference_python(spark):
    t = load_tables(spark, SF_DIR, ("lineitem", "part"))
    brand = {r["p_partkey"]: r["p_brand"] for r in t["part"].collect()}
    agg = defaultdict(lambda: [0, 0])
    for r in t["lineitem"].select("l_partkey", "l_returnflag").collect():
        a = agg[brand[r["l_partkey"]]]
        a[0] += 1
        a[1] += 1 if r["l_returnflag"] == "R" else 0
    tn = sum(a[0] for a in agg.values())
    tr = sum(a[1] for a in agg.values())
    got = {r["brand"]: r for r in QUERIES["parts_return_rate_by_brand"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for b, (n, r) in agg.items():
        row = got[b]
        assert row["n"] == n and row["r"] == r
        assert row["rate_ppm"] == (r * 1_000_000) // n
        assert row["rest_rate_ppm"] == ((tr - r) * 1_000_000) // (tn - n)
        d = r * (tn - n) - (tr - r) * n
        lhs = d * d * tn * tn * 1_000_000
        rhs = 3_841_459 * tr * (tn - tr) * tn * n * (tn - n)
        assert row["significant_5pct"] == (1 if lhs > rhs else 0), b


def test_return_rate_dimension_join_unhinted(spark):
    df = QUERIES["parts_return_rate_by_brand"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # only the single-row global broadcast may carry a hint; the part
    # dimension scales with SF and must stay unhinted
    assert analyzed.count("ResolvedHint") == 1


# ---------------------------------------------------------------------------
# embedding_split_centroid_shift
# ---------------------------------------------------------------------------


def test_centroid_shift_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    by = defaultdict(lambda: {0: [0, 0, [0] * 64], 1: [0, 0, [0] * 64]})
    for r in emb:
        h = r["vec_id"] % 2
        cell = by[r["label"]][h]
        cell[0] += 1
        q = [int(math.floor(float(x) * 1000)) for x in r["embedding"]]
        cell[1] += sum(v * v for v in q)
        for i, v in enumerate(q):
            cell[2][i] += v
    got = {r["label"]: r for r in QUERIES["embedding_split_centroid_shift"](spark, SF_DIR).collect()}
    for label, halves in by.items():
        (ne, nrm_e, se), (no, nrm_o, so) = halves[0], halves[1]
        if ne == 0 or no == 0:
            assert label not in got
            continue
        dist = sum(
            (se[i] * no - so[i] * ne) ** 2 for i in range(64)
        )
        denom = (ne * no) * (ne * no) * ((nrm_e + nrm_o) // (ne + no))
        row = got[label]
        assert (row["n_even"], row["n_odd"]) == (ne, no)
        assert row["shift_ppm"] == (dist * 1_000_000) // denom, label
        assert row["shift_ppm"] >= 0


# ---------------------------------------------------------------------------
# events_peak_to_mean
# ---------------------------------------------------------------------------


def test_peak_to_mean_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    hours = [r["ts"].replace(minute=0, second=0, microsecond=0) for r in events]
    span = int((max(hours) - min(hours)).total_seconds() // 3600) + 1
    cnt = Counter(
        (r["event_type"], r["ts"].replace(minute=0, second=0, microsecond=0))
        for r in events
    )
    agg = defaultdict(lambda: [0, 0])
    for (t, _), c in cnt.items():
        a = agg[t]
        a[0] += c
        a[1] = max(a[1], c)
    got = {r["event_type"]: r for r in QUERIES["events_peak_to_mean"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for t, (s, peak) in agg.items():
        row = got[t]
        assert row["n_events"] == s
        assert row["peak_hour_events"] == peak
        assert row["peak_to_mean_ppm"] == (peak * span * 1_000_000) // s
        # the peak is at least the mean
        assert row["peak_to_mean_ppm"] >= 1_000_000
