"""Behavior invariants for the round-9a tails/keyness wave
(plans/analytics_tails.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _log2_octave_ppm(x: int) -> int:
    """The shared octave-log2 ppm convention (analytics_readability)."""
    assert x > 0
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


def test_hill_matches_reference_python(spark):
    orders = load_tables(spark, SF_DIR, ("orders",))["orders"].collect()
    vals = sorted(
        ((int(r["o_totalprice"] * 100 // 1), r["o_orderkey"]) for r in orders),
        key=lambda t: (-t[0], t[1]),
    )
    got = {r["k"]: r for r in QUERIES["orders_hill_tail_index"](spark, SF_DIR).collect()}
    assert set(got) == {50, 100, 200}
    for k in (50, 100, 200):
        top = [v for v, _ in vals[:k]]
        thresh = top[-1]
        s = sum(_log2_octave_ppm(v) - _log2_octave_ppm(thresh) for v in top)
        row = got[k]
        assert row["thresh_cents"] == thresh
        assert row["gamma_ppm_bits"] == s // k
        if s > 0:
            assert row["alpha_micro"] == (k * 10**12) // (s * 693147 // 10**6)
        # heavier k should not jump wildly: gamma stays positive on real data
        assert row["gamma_ppm_bits"] > 0


def test_keyness_g2_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    tf = defaultdict(Counter)
    for r in docs:
        for t in re.findall(r"[a-z]+", r["text"].lower()):
            tf[r["source"]][t] += 1
    g = Counter()
    for c in tf.values():
        g.update(c)
    nn = sum(g.values())
    expect = {}
    for src, c in tf.items():
        r_tot = sum(c.values())
        s_tot = nn - r_tot
        best = None
        for term, a in c.items():
            b = g[term] - a
            # r10 bounded probability-ratio convention (1e12 fixed point)
            q_lg = _log2_octave_ppm(max(g[term] * 10**12 // nn, 1))
            t_a = a * (
                _log2_octave_ppm(max(a * 10**12 // r_tot, 1)) - q_lg
            )
            t_b = (
                b * (_log2_octave_ppm(max(b * 10**12 // s_tot, 1)) - q_lg)
                if b > 0
                else 0
            )
            g2 = max(2 * (t_a + t_b), 0)
            key = (str(g2).zfill(19)) + term
            if best is None or key > best[0]:
                best = (key, term, g2, r_tot)
        expect[src] = best
    got = {r["source"]: r for r in QUERIES["corpus_keyness_g2"](spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for src, (_, term, g2, r_tot) in expect.items():
        row = got[src]
        assert row["n_tokens"] == r_tot
        assert row["top_term"] == term, src
        assert row["top_g2_ppm_bits"] == g2


def test_lorenz_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    rev = defaultdict(int)
    for r in li:
        rev[r["l_suppkey"]] += int(r["l_extendedprice"] * 100 // 1)
    ordered = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    n, total = len(ordered), sum(rev.values())
    cum = []
    acc = 0
    for _, v in ordered:
        acc += v
        cum.append(acc)
    got = {r["decile"]: r for r in QUERIES["supplier_lorenz_curve"](spark, SF_DIR).collect()}
    assert set(got) == set(range(1, 10))
    prev = -1
    for d in range(1, 10):
        rank_at = (n * d) // 10
        row = got[d]
        assert row["rank_at"] == rank_at
        assert row["cum_rev_cents"] == cum[rank_at - 1]
        assert row["lorenz_ppm"] == cum[rank_at - 1] * 1_000_000 // total
        # Lorenz curves are monotone and below the diagonal
        assert row["lorenz_ppm"] > prev
        prev = row["lorenz_ppm"]
        assert row["lorenz_ppm"] <= d * 100_000
