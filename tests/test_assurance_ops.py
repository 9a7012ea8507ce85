"""Behavior invariants for the round-10c assurance wave
(plans/analytics_assurance.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check; these tests pin each query
against an independent pure-Python replica of the published algorithm.
"""

import hashlib
import math
import os
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_assurance import (
    _MMR_K,
    _MMR_LAM10,
    _MMR_POOL,
    _MMR_Q,
    _PARA_W,
)
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _fix6(x: float) -> int:
    # HALF_UP away from zero — Spark F.round / DuckDB round() on doubles
    return int(math.floor(abs(x) * 1_000_000.0 + 0.5)) * (1 if x >= 0 else -1)


# --------------------------------------------------------------------------
# t-closeness
# --------------------------------------------------------------------------


def _tcl_replica(spark):
    ev = load_tables(spark, SF_DIR, ("events",)).get("events").collect()
    per_class = defaultdict(Counter)
    for r in ev:
        cents = int(math.floor(r["value"] * 100))
        band = cents.bit_length()
        key = (int(r["user_id"]) // 10, r["ts"].hour)
        per_class[key][band] += 1
    gband = Counter()
    for c in per_class.values():
        gband.update(c)
    grid = sorted(gband)
    m = len(grid)
    n = sum(gband.values())
    cg = {}
    run = 0
    for b in grid:
        run += gband[b]
        cg[b] = run
    census = defaultdict(lambda: [0, 0, 0])  # n_classes, n_rows, max_t
    for key, c in per_class.items():
        n_c = sum(c.values())
        ca, d = 0, 0
        for b in grid:
            ca += c.get(b, 0)
            d += abs(ca * n - cg[b] * n_c)
        t_ppm = d * 1_000_000 // ((m - 1) * n_c * n)
        if t_ppm <= 50_000:
            band_lbl = "1:<=5%"
        elif t_ppm <= 100_000:
            band_lbl = "2:<=10%"
        elif t_ppm <= 200_000:
            band_lbl = "3:<=20%"
        else:
            band_lbl = "4:>20%"
        cell = census[band_lbl]
        cell[0] += 1
        cell[1] += n_c
        cell[2] = max(cell[2], t_ppm)
    return {
        lbl: (
            cnt,
            rows,
            rows * 1_000_000 // n,
            mx,
        )
        for lbl, (cnt, rows, mx) in census.items()
    }


def test_t_closeness_matches_python_replica(spark):
    expect = _tcl_replica(spark)
    got = {
        r["t_band"]: (
            r["n_classes"],
            r["n_rows"],
            r["rows_ppm"],
            r["max_t_ppm"],
        )
        for r in QUERIES["events_t_closeness"](spark, SF_DIR).collect()
    }
    assert got == expect
    # EMD is bounded by 1e6·m/(m−1): every band is a legal closeness level
    assert sum(v[1] for v in got.values()) == sum(
        v[1] for v in expect.values()
    )


# --------------------------------------------------------------------------
# split conformal
# --------------------------------------------------------------------------


def _cfm_replica(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",)).get("lineitem").collect()
    rows = []
    for r in li:
        sp = _md5_60(f"{r['l_orderkey']}|{r['l_linenumber']}") % 4
        rows.append(
            (
                int(r["l_quantity"]),
                int(math.floor(r["l_extendedprice"])),
                r["l_returnflag"],
                sp,
            )
        )
    train = [(g, y) for g, y, _f, sp in rows if sp <= 1]
    sums, cnts = Counter(), Counter()
    for g, y in train:
        sums[g] += y
        cnts[g] += 1
    fit = {g: sums[g] // cnts[g] for g in sums}
    gy = sum(s for s in sums.values()) // sum(cnts.values())
    cal = sorted(
        abs(y - fit.get(g, gy)) for g, y, _f, sp in rows if sp == 2
    )
    n_cal = len(cal)
    r_rank = min((9 * n_cal + 18) // 10, n_cal)
    qhat = cal[r_rank - 1]
    test = [(f, abs(y - fit.get(g, gy))) for g, y, f, sp in rows if sp == 3]
    out = {}
    for stratum in {"*"} | {f for f, _s in test}:
        sel = test if stratum == "*" else [t for t in test if t[0] == stratum]
        cov = sum(1 for _f, s in sel if s <= qhat)
        out[stratum] = (
            len(sel),
            cov,
            cov * 1_000_000 // len(sel),
            qhat,
            n_cal,
        )
    return out


def test_conformal_matches_python_replica(spark):
    expect = _cfm_replica(spark)
    res = QUERIES["lineitem_conformal_interval"](spark, SF_DIR).collect()
    got = {
        r["stratum"]: (
            r["n_test"],
            r["n_covered"],
            r["coverage_ppm"],
            r["qhat_dollars"],
            r["n_cal"],
        )
        for r in res
    }
    assert got == expect
    # split conformal's marginal guarantee: coverage ≈ 90 % (finite-sample
    # slack at sf grade — assert the audit is in the right regime, not a
    # vacuous 0 or 1e6)
    marg = got["*"][2]
    assert 800_000 <= marg <= 1_000_000


# --------------------------------------------------------------------------
# CCNet paragraph dedup
# --------------------------------------------------------------------------


def _ccnet_replica(spark):
    docs = load_tables(spark, SF_DIR, ("documents",)).get("documents").collect()
    paras = []
    for r in docs:
        toks = [t for t in r["text"].split() if t]
        if not toks:
            continue
        for i in range(0, (len(toks) - 1) // _PARA_W + 1):
            seg = " ".join(toks[i * _PARA_W : (i + 1) * _PARA_W])
            paras.append((r["source"], _md5_60(seg)))
    hc = Counter(h for _s, h in paras)
    out = defaultdict(lambda: [0, 0])
    for s, h in paras:
        for key in (s, "*"):
            out[key][0] += 1
            out[key][1] += 1 if hc[h] > 1 else 0
    return {
        s: (n, d, d * 1_000_000 // n) for s, (n, d) in out.items()
    }


def test_ccnet_matches_python_replica(spark):
    expect = _ccnet_replica(spark)
    got = {
        r["source"]: (r["n_paras"], r["dup_paras"], r["dup_ppm"])
        for r in QUERIES["docs_ccnet_paragraph_dedup"](spark, SF_DIR).collect()
    }
    assert got == expect
    # the '*' row is the exact sum of the per-source rows (global
    # histogram, per-source census)
    star = got["*"]
    assert star[0] == sum(v[0] for k, v in got.items() if k != "*")
    assert star[1] == sum(v[1] for k, v in got.items() if k != "*")


# --------------------------------------------------------------------------
# MMR
# --------------------------------------------------------------------------


def _mmr_replica(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",)).get("embeddings").collect()
    vecs = {
        int(r["vec_id"]): [_fix6(float(x)) for x in r["embedding"]]
        for r in emb
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(vecs[a], vecs[b]))

    rows = []
    for q in range(_MMR_Q):
        rel = {c: dot(q, c) for c in vecs if c != q}
        pool = sorted(rel, key=lambda c: (-rel[c], c))[:_MMR_POOL]
        sel = []
        for step in range(1, _MMR_K + 1):
            cand = [c for c in pool if c not in sel]
            if step == 1:
                scored = [(c, rel[c], 0, _MMR_LAM10 * rel[c]) for c in cand]
            else:
                scored = []
                for c in cand:
                    ms = max(dot(c, s) for s in sel)
                    scored.append(
                        (
                            c,
                            rel[c],
                            ms,
                            _MMR_LAM10 * rel[c] - (10 - _MMR_LAM10) * ms,
                        )
                    )
            scored.sort(key=lambda t: (-t[3], t[0]))
            c, r, ms, sc = scored[0]
            rows.append((q, step, c, r, ms, sc))
            sel.append(c)
    return sorted(rows)


def test_mmr_matches_python_replica(spark):
    expect = _mmr_replica(spark)
    got = sorted(
        (
            r["query_id"],
            r["step"],
            r["picked_id"],
            r["rel_fix"],
            r["maxsim_fix"],
            r["score_fix"],
        )
        for r in QUERIES["embedding_mmr_rerank"](spark, SF_DIR).collect()
    )
    assert got == expect
    # diversification sanity: within a query the K picks are distinct and
    # step 1 is the pure-relevance argmax
    per_q = defaultdict(list)
    for q, step, c, *_rest in got:
        per_q[q].append(c)
    for q, picks in per_q.items():
        assert len(set(picks)) == _MMR_K
