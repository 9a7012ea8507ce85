"""Behavior + plan invariants for the round-7b evaluation wave
(plans/analytics_evaluation.py): RBO, Mann-Whitney U, MATTR, MIPS top-k,
streaming HLL twin. Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


# ---------------------------------------------------------------------------
# corpus_rank_biased_overlap
# ---------------------------------------------------------------------------


def test_rbo_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    total: Counter = Counter()
    df_count: dict = defaultdict(set)
    for d in docs:
        for t in _tokens(d.text):
            total[t] += 1
            df_count[t].add(d.doc_id)
    ra = sorted(total, key=lambda t: (-total[t], t))[:16]
    rb = sorted(df_count, key=lambda t: (-len(df_count[t]), t))[:16]
    lcm = 720720
    expected = {}
    cum = 0
    for d in range(1, 17):
        x_d = len(set(ra[:d]) & set(rb[:d]))
        cum += x_d * (lcm // d) * (1 << (16 - d))
        expected[d] = (x_d, x_d * 1_000_000 // d,
                       cum * 1_000_000 // (lcm * (1 << 16)))
    got = {
        r.d: (r.x_d, r.agree_ppm, r.rbo_ppm)
        for r in QUERIES["corpus_rank_biased_overlap"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_rbo_rankings_are_per_task_topk(spark):
    """Both vocabulary rankings must plan as TakeOrderedAndProject(16) (or
    WindowGroupLimit) — never a single-partition sort of the vocabulary."""
    plan = _plan(spark, "corpus_rank_biased_overlap")
    assert (
        plan.count("TakeOrderedAndProject") >= 2 or "WindowGroupLimit" in plan
    )
    assert "CartesianProduct" not in plan


def test_rbo_monotone_depth_and_bounds(spark):
    rows = sorted(
        QUERIES["corpus_rank_biased_overlap"](spark, SF_DIR).collect(),
        key=lambda r: r.d,
    )
    assert [r.d for r in rows] == list(range(1, 17))
    for r in rows:
        assert 0 <= r.x_d <= r.d
        assert 0 <= r.rbo_ppm <= 1_000_000
    # cumulative RBO never decreases with depth (weights are positive)
    assert all(a.rbo_ppm <= b.rbo_ppm for a, b in zip(rows, rows[1:]))


# ---------------------------------------------------------------------------
# orders_mann_whitney
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_reference_python(spark):
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    f_vals, o_vals = [], []
    for r in orders:
        c = int(math.floor(r.o_totalprice * 100))
        if r.o_orderstatus == "F":
            f_vals.append(c)
        elif r.o_orderstatus == "O":
            o_vals.append(c)
    n_f, n_o = len(f_vals), len(o_vals)
    n = n_f + n_o
    # doubled U: wins count 2, ties count 1
    o_counter = Counter(o_vals)
    o_sorted = sorted(o_counter)
    u2 = 0
    for v in f_vals:
        for ov in o_sorted:
            if ov < v:
                u2 += 2 * o_counter[ov]
            elif ov == v:
                u2 += o_counter[ov]
            else:
                break
    tie = Counter(f_vals) + Counter(o_vals)
    s_t = sum(t ** 3 - t for t in tie.values())
    z2_num = 3 * (u2 - n_f * n_o) ** 2 * n * (n - 1) * 1_000_000
    z2_den = n_f * n_o * (n ** 3 - n - s_t)
    z2 = z2_num // z2_den
    rows = QUERIES["orders_mann_whitney"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_f, r.n_o, r.u2) == (n_f, n_o, u2)
    assert r.cles_ppm == u2 * 1_000_000 // (2 * n_f * n_o)
    assert r.z2_ppm == z2
    assert r.reject_5pct == int(z2 > 3_841_459)


def test_mann_whitney_bounds(spark):
    r = QUERIES["orders_mann_whitney"](spark, SF_DIR).collect()[0]
    assert 0 <= r.u2 <= 2 * r.n_f * r.n_o
    assert 0 <= r.cles_ppm <= 1_000_000
    assert r.z2_ppm >= 0


# ---------------------------------------------------------------------------
# docs_mattr
# ---------------------------------------------------------------------------


def test_mattr_matches_naive_sliding_windows(spark):
    """The O(L) first-occurrence identity must equal the NAIVE O(L*W)
    per-window distinct count — the strongest possible check of the
    rewrite."""
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    expected = {}
    for d in docs:
        toks = _tokens(d.text)
        length = len(toks)
        w = min(25, length)
        n_win = length - w + 1
        mass = sum(len(set(toks[s : s + w])) for s in range(n_win))
        expected[d.doc_id] = (length, w, n_win, mass,
                              mass * 1_000_000 // (w * n_win))
    got = {
        r.doc_id: (r.n_tokens, r.win_len, r.n_windows, r.distinct_mass,
                   r.mattr_ppm)
        for r in QUERIES["docs_mattr"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_mattr_bounds_and_plan(spark):
    rows = QUERIES["docs_mattr"](spark, SF_DIR).collect()
    for r in rows:
        # each window has between 1 and win_len types
        assert r.n_windows <= r.distinct_mass <= r.win_len * r.n_windows
        assert 0 < r.mattr_ppm <= 1_000_000
    plan = _plan(spark, "docs_mattr")
    assert "CartesianProduct" not in plan
    assert "SinglePartition" not in plan  # windows are doc-keyed


# ---------------------------------------------------------------------------
# knn_mips
# ---------------------------------------------------------------------------


def _half_up_1e6(x: float) -> int:
    return int(math.floor(abs(x) * 1_000_000.0 + 0.5)) * (1 if x >= 0 else -1)


def test_mips_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    xm = {r.vec_id: [_half_up_1e6(float(x)) for x in r.embedding] for r in emb}
    expected = {}
    for q in range(10):
        dots = [
            (sum(a * b for a, b in zip(xm[q], v)), -vid)
            for vid, v in xm.items()
            if vid != q
        ]
        dots.sort(reverse=True)
        for rank, (dot, neg_vid) in enumerate(dots[:5], 1):
            expected[(q, -neg_vid)] = (dot, rank)
    got = {
        (r.query_id, r.neighbor_id): (r.dot_fix, r.rank)
        for r in QUERIES["knn_mips"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_mips_plan_broadcast_queries_group_limit(spark):
    """Corpus scanned once against broadcast query components; per-query
    top-k pushes into WindowGroupLimit."""
    plan = _plan(spark, "knn_mips")
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# stream_hll_twin
# ---------------------------------------------------------------------------


def test_stream_hll_twin_equals_batch_registers(spark):
    """The availableNow replay's final register state must equal the batch
    register build exactly (max aggregation is order-insensitive)."""

    def md5_60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    regs: dict = defaultdict(int)
    for r in events:
        hv = md5_60(f"hll:{r.user_id}")
        idx, w = hv >> 54, hv & ((1 << 54) - 1)
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[(r.event_type, idx)] = max(regs[(r.event_type, idx)], rho)
    got = {
        (r.event_type, r.idx): r.reg
        for r in QUERIES["stream_hll_twin"](spark, SF_DIR).collect()
    }
    assert got == dict(regs)
    # state boundedness: at most |types| x 64 registers ever exist
    n_types = len({t for t, _ in regs})
    assert len(got) <= 64 * n_types
