"""Behavior + plan invariants for the round-7k governance wave
(plans/analytics_governance.py): l-diversity, disparate impact, decile
lift, seasonal strength, winsorized mean. Cross-engine value equality is
covered by test_entry_oracle / tools/driver_check."""

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _sdiv(num: int, den: int) -> int:
    return num // den if num >= 0 else -((-num) // den)


# ---------------------------------------------------------------------------
# events_l_diversity
# ---------------------------------------------------------------------------


def test_l_diversity_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    classes: defaultdict = defaultdict(lambda: [0, set()])
    for r in ev:
        key = (r.user_id // 10, r.ts.hour)
        classes[key][0] += 1
        classes[key][1].add(r.event_type)
    bands: defaultdict = defaultdict(lambda: [0, 0])
    total = 0
    for sz, types in classes.values():
        l = len(types)
        band = "1" if l == 1 else ("2" if l == 2 else ("3-4" if l <= 4 else "5+"))
        bands[band][0] += 1
        bands[band][1] += sz
        total += sz
    expected = {
        band: (nc, nr, nr * 1_000_000 // total)
        for band, (nc, nr) in bands.items()
    }
    got = {
        r.l_band: (r.n_classes, r.n_rows, r.rows_ppm)
        for r in QUERIES["events_l_diversity"](spark, SF_DIR).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# orders_disparate_impact
# ---------------------------------------------------------------------------


def test_disparate_impact_matches_reference_python(spark):
    t = load_tables(spark, SF_DIR, ("orders", "customer"))
    seg = {r.c_custkey: r.c_mktsegment for r in t["customer"].collect()}
    g: defaultdict = defaultdict(lambda: [0, 0])
    for r in t["orders"].collect():
        s = seg[r.o_custkey]
        g[s][0] += 1
        g[s][1] += 1 if r.o_orderpriority == "1-URGENT" else 0
    rates = {s: pos * 1_000_000 // n for s, (n, pos) in g.items()}
    best = max(rates.values())
    expected = {
        s: (n, pos, rates[s], rates[s] * 1_000_000 // best)
        for s, (n, pos) in g.items()
    }
    got = {
        r.segment: (r.n_orders, r.n_urgent, r.rate_ppm, r.di_vs_best_ppm)
        for r in QUERIES["orders_disparate_impact"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_disparate_impact_no_forced_dimension_broadcast(spark):
    """The customer join must not carry a broadcast HINT (customer scales
    with SF); AQE may still choose broadcast at runtime."""
    df = QUERIES["orders_disparate_impact"](spark, SF_DIR)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly ONE hint is allowed: the single-row best-rate scalar;
    # the customer-dimension join itself must stay unhinted
    assert analyzed.count("ResolvedHint") == 1


# ---------------------------------------------------------------------------
# customer_decile_lift
# ---------------------------------------------------------------------------


def test_decile_lift_matches_reference_python(spark):
    od = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    spend: defaultdict = defaultdict(lambda: [0, 0])
    for r in od:
        spend[r.o_custkey][0] += int(math.floor(r.o_totalprice * 100))
        if r.o_orderpriority == "1-URGENT":
            spend[r.o_custkey][1] = 1
    n = len(spend)
    ranked = sorted(spend.items(), key=lambda kv: (-kv[1][0], kv[0]))
    dec: defaultdict = defaultdict(lambda: [0, 0])
    for i, (ck, (sp, resp)) in enumerate(ranked, start=1):
        d = ((i - 1) * 10) // n
        dec[d][0] += 1
        dec[d][1] += resp
    overall = sum(v[1] for v in dec.values()) * 1_000_000 // n
    expected = {}
    for d, (nc, resp) in dec.items():
        rate = resp * 1_000_000 // nc
        expected[d] = (nc, resp, rate, rate * 1_000_000 // overall)
    got = {
        r.decile: (r.n_customers, r.responders, r.rate_ppm, r.lift_ppm)
        for r in QUERIES["customer_decile_lift"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_decile_lift_no_global_sort(spark):
    plan = _plan(spark, "customer_decile_lift")
    assert "rangepartitioning" not in plan.lower()


# ---------------------------------------------------------------------------
# orders_seasonal_strength
# ---------------------------------------------------------------------------


def test_seasonal_strength_matches_reference_python(spark):
    od = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    daily: Counter = Counter()
    for r in od:
        daily[r.o_orderdate.date()] += int(math.floor(r.o_totalprice * 100))
    days = sorted(daily)
    rows = []
    for i in range(3, len(days) - 3):
        s7 = sum(daily[days[j]] for j in range(i - 3, i + 4))
        rows.append(
            (days[i].isoweekday(), 7 * daily[days[i]], 7 * daily[days[i]] - s7)
        )
    seas = {}
    for dow in set(d for d, _, _ in rows):
        xs = [x7 for d, _, x7 in rows if d == dow]
        seas[dow] = _sdiv(sum(xs), len(xs))
    r7 = [x7 - seas[d] for d, _, x7 in rows]
    d7 = [x7 for _, _, x7 in rows]
    t7 = [y7 - seas[d] for d, y7, _ in rows]
    n = len(rows)

    def var_num(xs):
        return n * sum(x * x for x in xs) - sum(xs) ** 2

    fs = max(1_000_000 - var_num(r7) * 1_000_000 // var_num(d7), 0)
    ft = max(1_000_000 - var_num(r7) * 1_000_000 // var_num(t7), 0)
    row = QUERIES["orders_seasonal_strength"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n_days, r.f_seasonal_ppm, r.f_trend_ppm) == (n, fs, ft)


# ---------------------------------------------------------------------------
# supplier_winsorized_balance
# ---------------------------------------------------------------------------


def test_winsorized_balance_matches_reference_python(spark):
    sup = load_tables(spark, SF_DIR, ("supplier",))["supplier"].collect()
    cs = sorted(int(math.floor(r.s_acctbal * 100)) for r in sup)
    n = len(cs)
    q_lo = cs[((5 * (n - 1)) // 100 + 1) - 1]
    q_hi = cs[((95 * (n - 1)) // 100 + 1) - 1]
    raw = _sdiv(sum(cs), n)
    wins = _sdiv(sum(min(max(c, q_lo), q_hi) for c in cs), n)
    row = QUERIES["supplier_winsorized_balance"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n,
        r.q5_cents,
        r.q95_cents,
        r.raw_mean_cents,
        r.winsorized_mean_cents,
    ) == (n, q_lo, q_hi, raw, wins)


def test_winsorized_mean_between_quantiles(spark):
    r = QUERIES["supplier_winsorized_balance"](spark, SF_DIR).collect()[0]
    assert r.q5_cents <= r.winsorized_mean_cents <= r.q95_cents
