"""Behavior invariants for the round-10a mixture/budget wave
(plans/analytics_budget.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_budget import (
    _DH_HAM_MAX,
    _DH_SEG_BYTES,
    _DH_SEGS,
    _EPOCH_CAP,
)
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _log2_octave_ppm(x: int) -> int:
    assert x > 0
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


def _source_tokens(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    c = Counter()
    for r in docs:
        c[r["source"]] += len(re.findall(r"[a-z]+", r["text"].lower()))
    return c


def test_unimax_matches_reference_python(spark):
    c = _source_tokens(spark)
    budget = 2 * sum(c.values())
    # reference: the SEQUENTIAL UniMax loop with the closed form's
    # remainder convention — sort capacities ascending, full takes while
    # the capacity fits the running fair share, then threshold + one
    # extra token to each of the `rem` largest capped sources.
    caps = sorted(((cnt * _EPOCH_CAP, src) for src, cnt in c.items()))
    s = len(caps)
    pfx = 0
    kstar, pk = 0, 0
    for i, (cap, _src) in enumerate(caps, start=1):
        if cap * (s - i + 1) <= budget - pfx:
            kstar, pk = i, pfx + cap
        pfx += cap
    tau = (budget - pk) // (s - kstar) if kstar < s else 0
    rem = (budget - pk) - tau * (s - kstar) if kstar < s else 0
    expect = {}
    for i, (cap, src) in enumerate(caps, start=1):
        if i <= kstar:
            alloc = cap
        elif i > s - rem:
            alloc = tau + 1
        else:
            alloc = tau
        expect[src] = (cap, alloc, i > kstar)
    got = {r["source"]: r for r in QUERIES["docs_unimax_budget"](spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for src, (cap, alloc, capped) in expect.items():
        row = got[src]
        assert row["n_tokens"] == c[src]
        assert row["capacity_tokens"] == cap
        assert row["alloc_tokens"] == alloc, src
        assert row["epochs_ppm"] == alloc * 1_000_000 // c[src]
        assert row["capped"] == int(capped)
    # the waterfilling identity: the budget is spent exactly
    assert sum(r["alloc_tokens"] for r in got.values()) == budget
    # budget 2·total < capacity 4·total, so SOMEONE is capped (on a
    # near-uniform corpus everyone is — that's valid UniMax behavior)
    assert any(r["capped"] == 1 for r in got.values())
    # no allocation exceeds its capacity and epochs cap at E
    for r in got.values():
        assert r["alloc_tokens"] <= r["capacity_tokens"]
        assert r["epochs_ppm"] <= _EPOCH_CAP * 1_000_000
    # capped allocations never exceed any full-take capacity rank above
    # them: allocs of capped sources differ by at most 1 token (tau/tau+1)
    capped_allocs = {r["alloc_tokens"] for r in got.values() if r["capped"] == 1}
    assert max(capped_allocs) - min(capped_allocs) <= 1


def test_mixture_reweight_matches_reference_python(spark):
    c = _source_tokens(spark)
    total = sum(c.values())
    budget = total // 2
    w = {src: _log2_octave_ppm(cnt) for src, cnt in c.items()}
    wsum = sum(w.values())
    got = {r["source"]: r for r in QUERIES["docs_mixture_reweight"](spark, SF_DIR).collect()}
    assert set(got) == set(c) | {"*"}
    alloc_sum = req_sum = 0
    for src, cnt in c.items():
        req = w[src] * budget // wsum
        alloc = min(cnt, req)
        row = got[src]
        assert row["weight_ppm_bits"] == w[src]
        assert row["requested_tokens"] == req
        assert row["alloc_tokens"] == alloc
        assert row["natural_share_ppm"] == cnt * 1_000_000 // total
        assert row["budget_share_ppm"] == alloc * 1_000_000 // budget
        assert row["capped"] == int(alloc < req)
        alloc_sum += alloc
        req_sum += req
    star = got["*"]
    assert star["n_tokens"] == total
    assert star["alloc_tokens"] == alloc_sum
    assert star["requested_tokens"] == req_sum
    # one-pass with no redistribution: unspent budget is visible
    assert alloc_sum <= budget
    # log dampening: the largest source's budget share never exceeds its
    # natural share (w grows ~log c, so requested/B <= c/total for the
    # max source whenever weights are sub-proportional)
    biggest = max(c, key=lambda s: (c[s], s))
    assert (
        got[biggest]["budget_share_ppm"]
        <= got[biggest]["natural_share_ppm"] + 1
    )


def _dhash_py(text: str) -> int:
    b = text.encode("utf-8")
    segs = []
    for j in range(_DH_SEGS):
        lo = j * _DH_SEG_BYTES
        hi = min((j + 1) * _DH_SEG_BYTES, len(b))
        segs.append(sum(b[lo:hi]) // (hi - lo) if lo < hi else 0)
    dh = 0
    for j in range(_DH_SEGS - 1):
        if segs[j] > segs[j + 1]:
            dh |= 1 << j
    return dh


def test_dhash_neardup_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    h = {r["doc_id"]: _dhash_py(r["text"]) for r in docs}
    ids = sorted(h)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ham = bin(h[a] ^ h[b]).count("1")
            if ham <= _DH_HAM_MAX:
                expect[(a, b)] = ham
    got = {
        (r["asset_a"], r["asset_b"]): r["hamming"]
        for r in QUERIES["multimodal_dhash_neardup"](spark, SF_DIR).collect()
    }
    assert got == expect
    # the planted suffix-edit near-dups (shared 80-char prefix) are found
    planted = set()
    texts = {r["doc_id"]: r["text"] for r in docs}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = texts[a], texts[b]
            if ta != tb and ta[:80] == tb[:80] and (
                ta.startswith(tb[: len(tb) - 4]) or tb.startswith(ta[: len(ta) - 4])
            ):
                planted.add((a, b))
    if planted:  # most planted pairs collide at Hamming <= _DH_HAM_MAX
        found = sum(1 for p in planted if p in got)
        assert found >= len(planted) * 3 // 4, (found, len(planted))


def test_dhash_plan_is_banded_not_cartesian(spark):
    df = QUERIES["multimodal_dhash_neardup"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the pair join is an equi-join on the (k, band) bucket key
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "band" in analyzed


def test_budget_single_corpus_scan(spark):
    # the |sources|-row token rollup is localCheckpointed, so the corpus
    # scan runs ONCE at build time and every grid consumer reads the
    # checkpointed RDD — at 100 TB the alternative is 4 full scans
    for name in ("docs_unimax_budget", "docs_mixture_reweight"):
        plan = QUERIES[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 0, name
        assert "Scan ExistingRDD" in plan, name
