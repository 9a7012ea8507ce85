"""Behavior + plan invariants for the round-7a probes wave
(plans/analytics_probes.py): HyperLogLog, KS test, autocorrelation,
JL projection, term dispersion. Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import hashlib
import math
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _trunc_div(num: int, den: int) -> int:
    """Truncating (toward-zero) division of a signed numerator — Spark
    ``div`` semantics, sign-split like the SQL in the module."""
    return num // den if num >= 0 else -((-num) // den)


# ---------------------------------------------------------------------------
# events_hll_estimate
# ---------------------------------------------------------------------------


def test_hll_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    regs: dict = defaultdict(lambda: defaultdict(int))
    exact: dict = defaultdict(set)
    for r in events:
        hv = _md5_60(f"hll:{r.user_id}")
        idx, w = hv >> 54, hv & ((1 << 54) - 1)
        rho = 55 if w == 0 else 55 - w.bit_length()
        regs[r.event_type][idx] = max(regs[r.event_type][idx], rho)
        exact[r.event_type].add(r.user_id)
    expected = {}
    for t, rr in regs.items():
        s = sum(1 << (60 - rr.get(j, 0)) for j in range(64))
        v = sum(1 for j in range(64) if rr.get(j, 0) == 0)
        est = (709 * 64 * 64 * (1 << 60)) // (1000 * s)
        n = len(exact[t])
        err = _trunc_div((est - n) * 1_000_000, n)
        expected[t] = (64, v, n, est, err)
    got = {
        r.event_type: (r.m, r.n_zero_regs, r.exact_users, r.hll_est, r.err_ppm)
        for r in QUERIES["events_hll_estimate"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_hll_register_build_partial_combines(spark):
    """The sketch build must partial-aggregate map-side (shuffle carries at
    most m rows per type per task, never the raw stream)."""
    plan = _plan(spark, "events_hll_estimate")
    assert "partial_max" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# lineitem_ks_test
# ---------------------------------------------------------------------------


def test_ks_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    counts: dict = defaultdict(lambda: [0, 0])
    n_r = n_n = 0
    for r in li:
        if r.l_returnflag == "R":
            counts[int(math.floor(r.l_quantity * 100))][0] += 1
            n_r += 1
        elif r.l_returnflag == "N":
            counts[int(math.floor(r.l_quantity * 100))][1] += 1
            n_n += 1
    cum_r = cum_n = 0
    d_num = 0
    for q in sorted(counts):
        cum_r += counts[q][0]
        cum_n += counts[q][1]
        d_num = max(d_num, abs(cum_r * n_n - cum_n * n_r))
    d_ppm = d_num * 1_000_000 // (n_r * n_n)
    reject = int(d_ppm * d_ppm * n_r * n_n > 1_844_164 * (n_r + n_n) * 1_000_000)
    rows = QUERIES["lineitem_ks_test"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_r, r.n_n, r.d_num, r.d_ppm, r.reject_5pct) == (
        n_r, n_n, d_num, d_ppm, reject,
    )


def test_ks_single_row_and_bounded(spark):
    r = QUERIES["lineitem_ks_test"](spark, SF_DIR).collect()[0]
    assert 0 <= r.d_ppm <= 1_000_000
    assert r.reject_5pct in (0, 1)


# ---------------------------------------------------------------------------
# events_autocorrelation
# ---------------------------------------------------------------------------


def test_acf_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_type = defaultdict(list)
    for r in events:
        by_type[r.event_type].append(
            (r.ts, r.event_id, int(math.floor(r.value * 1_000_000)))
        )
    expected = {}
    for t, rows in by_type.items():
        rows.sort()
        xs = [v for _, _, v in rows]
        n, s, q2 = len(xs), sum(xs), sum(v * v for v in xs)
        for k in (1, 2, 3):
            pairs = list(zip(xs, xs[k:]))
            p = sum(a * b for a, b in pairs)
            h = sum(a for a, _ in pairs)
            tl = sum(b for _, b in pairs)
            num = n * n * p - n * s * (h + tl) + (n - k) * s * s
            den = n * (n * q2 - s * s)
            expected[(t, k)] = (len(pairs), _trunc_div(num * 1_000_000, den))
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.r_ppm)
        for r in QUERIES["events_autocorrelation"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_acf_invariants_and_plan(spark):
    rows = QUERIES["events_autocorrelation"](spark, SF_DIR).collect()
    types = {r.event_type for r in rows}
    assert len(rows) == 3 * len(types)
    for r in rows:
        # |r_k| <= 1 exactly (Cauchy-Schwarz), so ppm stays in band
        assert -1_000_000 <= r.r_ppm <= 1_000_000
    plan = _plan(spark, "events_autocorrelation")
    # one ordered window per branch, never a join back to the raw series
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


# ---------------------------------------------------------------------------
# embedding_jl_distortion
# ---------------------------------------------------------------------------


def _half_up(x: float) -> int:
    return int(math.floor(abs(x) * 1_000_000.0 + 0.5)) * (1 if x >= 0 else -1)


def test_jl_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    sample = {r.vec_id: r.embedding for r in emb.filter("vec_id < 10").collect()}
    signs = {
        (i, j): 1 if _md5_60(f"jl:{i}:{j}") % 2 == 0 else -1
        for i in range(64)
        for j in range(16)
    }
    xm = {vid: [_half_up(float(x)) for x in v] for vid, v in sample.items()}
    proj = {
        vid: [sum(signs[(i, j)] * v[i] for i in range(64)) for j in range(16)]
        for vid, v in xm.items()
    }
    expected = {}
    ids = sorted(xm)
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d2o = sum((xa - xb) ** 2 for xa, xb in zip(xm[a], xm[b]))
            d2p = sum((ya - yb) ** 2 for ya, yb in zip(proj[a], proj[b]))
            if d2o > 0:
                expected[(a, b)] = (d2o, d2p, d2p * 1_000_000 // (16 * d2o))
    got = {
        (r.vid_a, r.vid_b): (r.d2_orig, r.d2_proj, r.ratio_ppm)
        for r in QUERIES["embedding_jl_distortion"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_jl_broadcasts_sign_table(spark):
    """The projection joins component rows against the BROADCAST d x k sign
    table — corpus-linear, no cartesian product."""
    plan = _plan(spark, "embedding_jl_distortion")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# docs_term_dispersion
# ---------------------------------------------------------------------------


def test_dispersion_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    per_term: dict = defaultdict(lambda: defaultdict(int))
    for d in docs:
        for tok in re.split(r"\s+", d.text):
            if tok:
                per_term[tok][d.doc_id] += 1
    n_docs = len(docs)
    stats = []
    for term, cd in per_term.items():
        if len(cd) < 5:
            continue
        total = sum(cd.values())
        q = sum(c * c for c in cd.values())
        vmr = (n_docs * q - total * total) * 1_000_000 // (n_docs * total)
        stats.append((term, len(cd), total, vmr))
    stats.sort(key=lambda s: (-s[2], s[0]))
    expected = {
        rk + 1: (term, df, total, vmr)
        for rk, (term, df, total, vmr) in enumerate(stats[:100])
    }
    got = {
        r.rk: (r.term, r.df, r.total, r.vmr_ppm)
        for r in QUERIES["docs_term_dispersion"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_dispersion_rank_uses_group_limit(spark):
    """The global top-k rank filter must run as per-task O(k) state — Spark
    plans either a WindowGroupLimit pushdown or (observed) a
    TakeOrderedAndProject below the window; a bare global-sort Window over
    the vocabulary would be neither. VMR is never negative (Cauchy-Schwarz:
    N*sum(c^2) >= T^2)."""
    plan = _plan(spark, "docs_term_dispersion")
    assert "WindowGroupLimit" in plan or "TakeOrderedAndProject" in plan
    for r in QUERIES["docs_term_dispersion"](spark, SF_DIR).collect():
        assert r.vmr_ppm >= 0
