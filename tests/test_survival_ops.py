"""Behavior + plan invariants for the round-8e survival wave
(plans/analytics_survival.py): shipping hazard life table, Markov
entropy rate, quality-gate Venn.  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

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


# ---------------------------------------------------------------------------
# lineitem_shipping_hazard
# ---------------------------------------------------------------------------


def test_hazard_life_table_matches_reference_python(spark):
    t = load_tables(spark, SF_DIR, ("lineitem", "orders"))
    odate = {r["o_orderkey"]: r["o_orderdate"] for r in t["orders"].collect()}
    delays = Counter()
    for r in t["lineitem"].select("l_orderkey", "l_shipdate").collect():
        delays[(r["l_shipdate"] - odate[r["l_orderkey"]]).days] += 1
    n = sum(delays.values())
    got = {r["delay_days"]: r for r in QUERIES["lineitem_shipping_hazard"](spark, SF_DIR).collect()}
    assert set(got) == set(delays)
    above = 0
    for d in sorted(delays, reverse=True):
        row = got[d]
        assert row["n_events"] == delays[d], d
        assert row["n_at_risk"] == above + delays[d], d
        assert row["hazard_ppm"] == (delays[d] * 1_000_000) // (above + delays[d])
        assert row["surviving_ppm"] == (above * 1_000_000) // n
        above += delays[d]
    # life-table identities: the largest delay has zero survivors, the
    # smallest has everyone at risk
    assert got[max(delays)]["surviving_ppm"] == 0
    assert got[min(delays)]["n_at_risk"] == n


# ---------------------------------------------------------------------------
# events_markov_entropy_rate
# ---------------------------------------------------------------------------


def test_entropy_rate_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    by_user = defaultdict(list)
    for r in events:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    n_from = Counter()
    for (a, _), c in trans.items():
        n_from[a] += c
    total = sum(n_from.values())
    got = {r["from_type"]: r for r in QUERIES["events_markov_entropy_rate"](spark, SF_DIR).collect()}
    assert set(got) == set(n_from)
    for a, nf in n_from.items():
        h = sum(
            (c * (_log2_ppm(nf) - _log2_ppm(c))) // nf
            for (x, _), c in trans.items()
            if x == a
        )
        row = got[a]
        assert row["n_from"] == nf
        assert row["h_ppm_bits"] == h, a
        assert row["weight_ppm"] == (nf * 1_000_000) // total
        assert row["contrib_ppm_bits"] == (nf * h) // total
        assert h >= 0


# ---------------------------------------------------------------------------
# docs_quality_gate_venn
# ---------------------------------------------------------------------------


def test_venn_cells_partition_the_corpus(spark):
    flags = QUERIES["docs_gopher_filter"](spark, SF_DIR).collect()
    want = Counter(
        (r["ok_words"], r["ok_symbols"], r["ok_stopwords"]) for r in flags
    )
    got = {
        (r["ok_words"], r["ok_symbols"], r["ok_stopwords"]): (
            r["n_docs"],
            r["share_ppm"],
        )
        for r in QUERIES["docs_quality_gate_venn"](spark, SF_DIR).collect()
    }
    n = sum(want.values())
    assert got == {
        k: (c, (c * 1_000_000) // n) for k, c in want.items()
    }
    assert sum(c for c, _ in got.values()) == n
