"""Behavior + plan invariants for the round-8b replay wave
(plans/analytics_replay.py): streaming upsert twin, sampled-quantile
accuracy, train/eval calibration.  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check; these recompute each result in
plain Python and pin plan shapes."""

import hashlib
import math
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# stream_upsert_twin
# ---------------------------------------------------------------------------


def test_stream_upsert_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    last = {}
    for r in sorted(events, key=lambda r: r["event_id"]):
        tomb = r["event_id"] % 37 == 0
        v_us = int(math.floor(float(r["value"]) * 1_000_000))
        last[r["user_id"]] = None if tomb else (r["event_type"], v_us)
    want = {
        uid: payload for uid, payload in last.items() if payload is not None
    }
    got = {
        r["user_pk"]: (r["etype"], r["v_us"])
        for r in QUERIES["stream_upsert_twin"](spark, SF_DIR).collect()
    }
    assert got == want
    # tombstone-last keys must be absent
    erased = [u for u, p in last.items() if p is None]
    assert erased, "fixture must exercise delete-on-null"
    assert not set(erased) & set(got)


# ---------------------------------------------------------------------------
# lineitem_sampled_quantile_error
# ---------------------------------------------------------------------------


def test_sampled_quantiles_match_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    vals = []
    for r in li:
        c = int(math.floor(float(r["l_extendedprice"]) * 100))
        h = int(
            hashlib.md5(
                f"sq:{r['l_orderkey']}:{r['l_linenumber']}".encode()
            ).hexdigest()[:15],
            16,
        )
        vals.append((c, h))
    n = len(vals)
    sample = sorted((h, c) for c, h in vals)[:1000]
    sample_sorted = sorted(c for _, c in sample)
    exact_sorted = sorted(c for c, _ in vals)
    got = {r["p"]: r for r in QUERIES["lineitem_sampled_quantile_error"](spark, SF_DIR).collect()}
    k = len(sample)
    for p in (50, 90, 99):
        exact = exact_sorted[((p * (n - 1)) // 100 + 1) - 1]
        est = sample_sorted[((p * (k - 1)) // 100 + 1) - 1]
        d = est - exact
        err = (d * 1_000_000) // exact if d >= 0 else -((-d * 1_000_000) // exact)
        row = got[p]
        assert (row["exact_cents"], row["sample_cents"], row["err_signed_ppm"]) == (
            exact,
            est,
            err,
        ), p


def test_sampled_quantiles_plan_shapes(spark):
    plan = _plan(spark, "lineitem_sampled_quantile_error")
    assert "TakeOrderedAndProject" in plan  # bottom-k sample
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# customer_calibration_bins
# ---------------------------------------------------------------------------


def test_calibration_matches_reference_python(spark):
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    spend = defaultdict(lambda: [0, 0])
    for r in orders:
        s = spend[r["o_custkey"]]
        s[0] += int(math.floor(float(r["o_totalprice"]) * 100))
        s[1] = max(s[1], 1 if r["o_orderpriority"] == "1-URGENT" else 0)
    train = {ck: v for ck, v in spend.items() if ck % 2 == 0}
    evalh = {ck: v for ck, v in spend.items() if ck % 2 == 1}
    tn = len(train)
    ranked = sorted(train.items(), key=lambda kv: (-kv[1][0], kv[0]))
    bins = defaultdict(list)
    cuts = {}
    for i, (ck, (sp, resp)) in enumerate(ranked):
        b = (i * 10) // tn
        bins[b].append((sp, resp))
        cuts[b] = min(cuts.get(b, sp), sp)
    pred = {
        b: (sum(r for _, r in rows) * 1_000_000) // len(rows)
        for b, rows in bins.items()
    }
    obs = defaultdict(lambda: [0, 0])
    for ck, (sp, resp) in evalh.items():
        above = [b for b, lo in cuts.items() if lo > sp]
        b = (max(above) + 1) if above else 0
        obs[b][0] += 1
        obs[b][1] += resp
    got = {r["bin"]: r for r in QUERIES["customer_calibration_bins"](spark, SF_DIR).collect()}
    assert set(got) == set(pred)
    for b in pred:
        n_eval, resp_sum = obs.get(b, [0, 0])
        o_ppm = (resp_sum * 1_000_000) // n_eval if n_eval else 0
        row = got[b]
        assert row["predicted_ppm"] == pred[b], b
        assert row["n_eval"] == n_eval, b
        assert row["observed_ppm"] == o_ppm, b
        assert row["gap_signed_ppm"] == o_ppm - pred[b], b


def test_calibration_plan_shapes(spark):
    plan = _plan(spark, "customer_calibration_bins")
    assert "CartesianProduct" not in plan
    # the eval half is binned against broadcast cuts, never sorted globally
    assert "BroadcastExchange" in plan
