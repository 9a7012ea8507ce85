"""Behavior + plan invariants for the round-7m experimentation wave
(plans/analytics_experimentation.py): CUPED, Wasserstein drift, X-bar/R
control, mean excess, aggregate diversity. Cross-engine value equality
is covered by test_entry_oracle / tools/driver_check."""

import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sdiv(num: int, den: int) -> int:
    return num // den if num >= 0 else -((-num) // den)


# ---------------------------------------------------------------------------
# events_cuped_variance_reduction
# ---------------------------------------------------------------------------


def test_cuped_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    per_user: defaultdict = defaultdict(lambda: [0, 0])
    for r in ev:
        v = int(math.floor(r.value * 1_000_000))
        if r.ts.day <= 15:
            per_user[r.user_id][0] += v
        else:
            per_user[r.user_id][1] += v
    xs = {u: (x // 10000, y // 10000) for u, (x, y) in per_user.items()}
    n = len(xs)
    sx = sum(x for x, _ in xs.values())
    sy = sum(y for _, y in xs.values())
    qx = sum(x * x for x, _ in xs.values())
    sxy = sum(x * y for x, y in xs.values())
    th = _sdiv((n * sxy - sx * sy) * 1_000_000, n * qx - sx * sx)
    a_vals = [1_000_000 * y - th * x for x, y in xs.values()]
    y6 = [1_000_000 * y for _, y in xs.values()]
    var_a = n * sum(a * a for a in a_vals) - sum(a_vals) ** 2
    var_y = n * sum(v * v for v in y6) - sum(y6) ** 2
    red = max(1_000_000 - var_a * 1_000_000 // var_y, 0)
    row = QUERIES["events_cuped_variance_reduction"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n_users, r.theta_ppm, r.var_reduction_ppm) == (n, th, red)


def test_cuped_reduction_bounded(spark):
    r = QUERIES["events_cuped_variance_reduction"](spark, SF_DIR).collect()[0]
    assert 0 <= r.var_reduction_ppm <= 1_000_000


# ---------------------------------------------------------------------------
# events_wasserstein_drift
# ---------------------------------------------------------------------------


def test_wasserstein_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    vals = [
        (int(math.floor(r.value * 1_000_000)), 1 if r.ts.day <= 15 else 2)
        for r in ev
    ]
    lo = min(c for c, _ in vals)
    hi = max(c for c, _ in vals)
    width = (hi - lo) // 16 + 1
    cnt: Counter = Counter()
    for c, h in vals:
        cnt[((c - lo) // width, h)] += 1
    n1 = sum(v for (b, h), v in cnt.items() if h == 1)
    n2 = sum(v for (b, h), v in cnt.items() if h == 2)
    cp = cq = 0
    cumdiff = 0
    for b in range(16):
        cp += cnt[(b, 1)]
        cq += cnt[(b, 2)]
        cumdiff += abs(cp * 1_000_000 // n1 - cq * 1_000_000 // n2)
    row = QUERIES["events_wasserstein_drift"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_first,
        r.n_second,
        r.bucket_width_us,
        r.cumdiff_ppm,
        r.w1_us,
    ) == (n1, n2, width, cumdiff, cumdiff * width // 1_000_000)


# ---------------------------------------------------------------------------
# lineitem_xbar_control
# ---------------------------------------------------------------------------


def test_xbar_control_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_day = defaultdict(list)
    for r in li:
        by_day[r.l_shipdate.date()].append(
            (r.l_orderkey, r.l_linenumber, int(math.floor(r.l_extendedprice * 100)))
        )
    subs = []
    for d, rows in by_day.items():
        rows.sort()
        if len(rows) >= 5:
            cs = [c for _, _, c in rows[:5]]
            subs.append((sum(cs), max(cs) - min(cs)))
    nd = len(subs)
    ssum = sum(s for s, _ in subs)
    sr = sum(r for _, r in subs)
    n_out = sum(
        1
        for s, _ in subs
        if abs(s * nd - ssum) * 1_000_000 > 577_000 * sr * 5
    )
    row = QUERIES["lineitem_xbar_control"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_days,
        r.subgroup_n,
        r.center_cents,
        r.rbar_cents,
        r.limit_halfwidth_cents,
        r.n_out_of_control,
    ) == (
        nd,
        5,
        ssum // (5 * nd),
        sr // nd,
        (577_000 * (sr // nd)) // 1_000_000,
        n_out,
    )


# ---------------------------------------------------------------------------
# events_mean_excess
# ---------------------------------------------------------------------------


def test_mean_excess_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    cs = sorted(int(math.floor(r.value * 1_000_000)) for r in ev)
    n = len(cs)
    u = cs[((90 * (n - 1)) // 100 + 1) - 1]
    exceed = [c for c in cs if c > u]
    me = sum(c - u for c in exceed) // len(exceed) if exceed else 0
    row = QUERIES["events_mean_excess"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n, r.u_us, r.n_exceed, r.exceed_ppm, r.mean_excess_us) == (
        n,
        u,
        len(exceed),
        len(exceed) * 1_000_000 // n,
        me,
    )


def test_mean_excess_rate_near_ten_percent(spark):
    r = QUERIES["events_mean_excess"](spark, SF_DIR).collect()[0]
    # nearest-rank p90 should cut roughly 10% (ties can shift it)
    assert 20_000 <= r.exceed_ppm <= 150_000
    assert r.mean_excess_us >= 0


# ---------------------------------------------------------------------------
# knn_aggregate_diversity
# ---------------------------------------------------------------------------


def test_aggregate_diversity_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    ids = sorted(vecs)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num
            / (
                math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(x * x for x in b))
            ),
            6,
        )

    freq: Counter = Counter()
    n_q = 0
    for q in [i for i in ids if i < 100]:
        n_q += 1
        sims = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in ids if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for _, c in sims:
            freq[c] += 1
    row = QUERIES["knn_aggregate_diversity"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_corpus,
        r.n_recommendations,
        r.n_distinct_items,
        r.coverage_ppm,
        r.max_item_freq,
    ) == (
        len(ids),
        n_q * 5,
        len(freq),
        len(freq) * 1_000_000 // len(ids),
        max(freq.values()),
    )
