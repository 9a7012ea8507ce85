"""Behavior + plan invariants for the round-8i affinity wave
(plans/analytics_affinity.py): type affinity, segment drift, length
octaves.  Cross-engine equality is covered by test_entry_oracle /
tools/driver_check."""

import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _log2_ppm(x: int) -> int:
    b = x.bit_length() - 1
    p = 1 << b
    return b * 1_000_000 + ((x - p) * 1_000_000) // p


def _sdiv(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


# ---------------------------------------------------------------------------
# events_type_affinity
# ---------------------------------------------------------------------------


def test_affinity_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    users = defaultdict(set)
    for r in events:
        users[r["event_type"]].add(r["user_id"])
    total = len(set().union(*users.values()))
    got = {
        (r["type_a"], r["type_b"]): r
        for r in QUERIES["events_type_affinity"](spark, SF_DIR).collect()
    }
    types = sorted(users)
    expected_pairs = 0
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            both = len(users[a] & users[b])
            if both == 0:
                assert (a, b) not in got
                continue
            expected_pairs += 1
            row = got[(a, b)]
            assert row["both_users"] == both
            assert row["users_a"] == len(users[a])
            assert row["users_b"] == len(users[b])
            union = len(users[a] | users[b])
            assert row["jaccard_ppm"] == (both * 1_000_000) // union
            assert row["lift_ppm"] == (both * total * 1_000_000) // (
                len(users[a]) * len(users[b])
            )
    assert len(got) == expected_pairs


# ---------------------------------------------------------------------------
# orders_mktsegment_drift
# ---------------------------------------------------------------------------


def test_segment_drift_matches_reference_python(spark):
    t = load_tables(spark, SF_DIR, ("orders", "customer"))
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in t["customer"].collect()}
    mc = Counter()
    for r in t["orders"].select("o_custkey", "o_orderdate").collect():
        mc[(r["o_orderdate"].strftime("%Y-%m"), seg[r["o_custkey"]])] += 1
    mt = Counter()
    gc = Counter()
    for (m, s), c in mc.items():
        mt[m] += c
        gc[s] += c
    tg = sum(mc.values())
    got = {r["month"]: r for r in QUERIES["orders_mktsegment_drift"](spark, SF_DIR).collect()}
    assert set(got) == set(mt)
    for m in mt:
        # r10 bounded probability-ratio convention (1e12 fixed point)
        kl = sum(
            _sdiv(
                c
                * (
                    _log2_ppm(max(c * 10**12 // mt[m], 1))
                    - _log2_ppm(max(gc[s] * 10**12 // tg, 1))
                ),
                mt[m],
            )
            for (mm, s), c in mc.items()
            if mm == m
        )
        top = max(
            ((c, s) for (mm, s), c in mc.items() if mm == m),
        )[1]
        row = got[m]
        assert row["n_orders"] == mt[m]
        assert row["kl_ppm_bits"] == kl, m
        assert row["top_segment"] == top, m


# ---------------------------------------------------------------------------
# docs_length_octave_profile
# ---------------------------------------------------------------------------


def test_length_octaves_match_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    agg = defaultdict(lambda: [0, 0])
    for r in docs:
        n = r["n_chars"]
        if n > 0:
            o = n.bit_length() - 1
            agg[o][0] += 1
            agg[o][1] += n
    total = sum(a[0] for a in agg.values())
    got = {r["octave"]: r for r in QUERIES["docs_length_octave_profile"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for o, (n, chars) in agg.items():
        row = got[o]
        assert row["octave_floor_chars"] == 1 << o
        assert row["n_docs"] == n
        assert row["share_ppm"] == (n * 1_000_000) // total
        assert row["mean_chars"] == chars // n
        # the mean lives inside the octave
        assert (1 << o) <= row["mean_chars"] < (1 << (o + 1))
