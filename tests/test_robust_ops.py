"""Behavior + plan invariants for the round-7g robust-inference wave
(plans/analytics_robust.py): Pettitt change point, Welch t², one-way
ANOVA F, Theil–Sen/Mann–Kendall trend, Bowley skewness. Cross-engine
value equality is covered by test_entry_oracle / tools/driver_check."""

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


def _daily_micros(events, key=None):
    daily: defaultdict = defaultdict(int)
    for r in events:
        k = (r.event_type, r.ts.date()) if key == "type" else r.ts.date()
        daily[k] += int(math.floor(r.value * 1_000_000))
    return daily


def _signed_div(num: int, den: int) -> int:
    return num // den if num >= 0 else -((-num) // den)


# ---------------------------------------------------------------------------
# events_pettitt_changepoint
# ---------------------------------------------------------------------------


def test_pettitt_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    daily = _daily_micros(ev, key="type")
    series: defaultdict = defaultdict(list)
    for (et, d), x in daily.items():
        series[et].append((d, x))
    expected = {}
    for et, rows in series.items():
        rows.sort()
        xs = [x for _, x in rows]
        n = len(xs)
        # doubled midranks off the sorted value ladder
        r2 = {}
        svals = sorted(xs)
        for v in set(xs):
            below = sum(1 for w in svals if w < v)
            t = svals.count(v)
            r2[v] = 2 * below + t + 1
        u, best = 0, None
        for t_idx, (d, x) in enumerate(rows, start=1):
            u += r2[x] - (n + 1)
            if t_idx < n:
                k = abs(u)
                if best is None or k > best[0]:
                    best = (k, d)
        k, d = best
        expected[et] = (
            n,
            str(d),
            k,
            (6 * k * k * 1_000_000) // (n**3 + n**2),
        )
    got = {
        r.event_type: (r.n_days, r.change_day, r.k_stat, r.stat_ppm)
        for r in QUERIES["events_pettitt_changepoint"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_pettitt_no_global_sort(spark):
    plan = _plan(spark, "events_pettitt_changepoint")
    assert "rangepartitioning" not in plan.lower()
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# lineitem_welch_ttest
# ---------------------------------------------------------------------------


def test_welch_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    agg = {"R": [0, 0, 0], "A": [0, 0, 0]}  # n, s, q in whole dollars
    for r in li:
        if r.l_returnflag in agg:
            d = int(math.floor(r.l_extendedprice))
            g = agg[r.l_returnflag]
            g[0] += 1
            g[1] += d
            g[2] += d * d
    (n_r, s_r, q_r), (n_a, s_a, q_a) = agg["R"], agg["A"]
    ar = ((n_r * q_r - s_r * s_r) * 1_000_000) // (n_r * n_r * (n_r - 1))
    aa = ((n_a * q_a - s_a * s_a) * 1_000_000) // (n_a * n_a * (n_a - 1))
    num6 = ((s_r * n_a - s_a * n_r) ** 2 * 1_000_000) // (
        n_r * n_r * n_a * n_a
    )
    arm, aam = ar // 1000, aa // 1000
    expected = (
        n_r,
        n_a,
        s_r * 1_000_000 // n_r,
        s_a * 1_000_000 // n_a,
        num6 * 1_000_000 // (ar + aa),
        ((arm + aam) ** 2 * (n_r - 1) * (n_a - 1) * 1_000_000)
        // (arm * arm * (n_a - 1) + aam * aam * (n_r - 1)),
    )
    row = QUERIES["lineitem_welch_ttest"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_r,
        r.n_a,
        r.mean_r_ppm,
        r.mean_a_ppm,
        r.t2_ppm,
        r.df_ppm,
    ) == expected


def test_welch_df_between_group_sizes(spark):
    r = QUERIES["lineitem_welch_ttest"](spark, SF_DIR).collect()[0]
    # Welch df lies in [min(n)-1, n_r+n_a-2]
    assert (min(r.n_r, r.n_a) - 1) * 1_000_000 <= r.df_ppm
    assert r.df_ppm <= (r.n_r + r.n_a - 2) * 1_000_000
    assert r.t2_ppm >= 0


# ---------------------------------------------------------------------------
# orders_anova_f
# ---------------------------------------------------------------------------


def test_anova_matches_reference_python(spark):
    od = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    groups: defaultdict = defaultdict(lambda: [0, 0, 0])
    for r in od:
        d = int(math.floor(r.o_totalprice))
        g = groups[r.o_orderpriority]
        g[0] += 1
        g[1] += d
        g[2] += d * d
    k = len(groups)
    n = sum(g[0] for g in groups.values())
    s = sum(g[1] for g in groups.values())
    q = sum(g[2] for g in groups.values())
    sb = sum((g[1] * g[1]) // g[0] for g in groups.values())
    ssb = max(sb - (s * s) // n, 0)
    ssw = max(q - sb, 0)
    f_ppm = (ssb * (n - k) * 1_000_000) // (ssw * (k - 1))
    row = QUERIES["orders_anova_f"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.k_groups, r.n, r.ssb_dollars2, r.ssw_dollars2, r.f_ppm) == (
        k,
        n,
        ssb,
        ssw,
        f_ppm,
    )


# ---------------------------------------------------------------------------
# events_theil_sen_trend
# ---------------------------------------------------------------------------


def test_theil_sen_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    daily = sorted(_daily_micros(ev).items())
    slopes, mk_s = [], 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            (da, ya), (db, yb) = daily[i], daily[j]
            dy, dt = yb - ya, (db - da).days
            slopes.append((_signed_div(dy, dt), da, db))
            mk_s += 1 if dy > 0 else (-1 if dy < 0 else 0)
    slopes.sort()
    m = len(slopes)
    median = slopes[(m + 1) // 2 - 1][0]
    row = QUERIES["events_theil_sen_trend"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n_days, r.n_pairs, r.mk_s, r.sen_slope_us_per_day) == (
        len(daily),
        m,
        mk_s,
        median,
    )


def test_theil_sen_mk_sign_consistent(spark):
    r = QUERIES["events_theil_sen_trend"](spark, SF_DIR).collect()[0]
    assert abs(r.mk_s) <= r.n_pairs
    # the pair relation is exactly n_days choose 2
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2


# ---------------------------------------------------------------------------
# events_bowley_skewness
# ---------------------------------------------------------------------------


def test_bowley_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    vals: defaultdict = defaultdict(list)
    for r in ev:
        vals[r.event_type].append(int(math.floor(r.value * 1_000_000)))
    expected = {}
    for et, xs in vals.items():
        xs.sort()
        n = len(xs)
        q1, q2, q3 = (
            xs[((q * (n - 1)) // 100 + 1) - 1] for q in (25, 50, 75)
        )
        b = (
            0
            if q3 == q1
            else _signed_div((q3 + q1 - 2 * q2) * 1_000_000, q3 - q1)
        )
        expected[et] = (n, q1, q2, q3, b)
    got = {
        r.event_type: (r.n, r.q1_us, r.q2_us, r.q3_us, r.bowley_ppm)
        for r in QUERIES["events_bowley_skewness"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_bowley_bounded(spark):
    rows = QUERIES["events_bowley_skewness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -1_000_000 <= r.bowley_ppm <= 1_000_000
        assert r.q1_us <= r.q2_us <= r.q3_us
    plan = _plan(spark, "events_bowley_skewness")
    assert "rangepartitioning" not in plan.lower()
