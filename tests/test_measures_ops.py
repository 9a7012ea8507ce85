"""Behavior + plan invariants for the round-6k measures wave
(plans/analytics_measures.py): Simpson diversity, chi-square contingency,
shipping SLA. Cross-engine value equality is covered by test_entry_oracle /
tools/driver_check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_measures import _BAND_WIDTH

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_simpson_matches_reference_python(spark):
    import re
    from collections import Counter

    from kafka_sink_spark.session import load_tables

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    expected = {}
    for d in docs:
        c = Counter(t for t in re.split(r"\s+", d.text) if t)
        n = sum(c.values())
        expected[d.doc_id] = (
            n,
            len(c),
            1_000_000 - sum(v * v for v in c.values()) * 1_000_000 // (n * n),
            len(c) * 1_000_000 // n,
        )
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.simpson_ppm, r.ttr_ppm)
        for r in QUERIES["docs_simpson_diversity"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_simpson_bounds(spark):
    """0 ≤ Simpson < 1e6; single-type docs would score 0; TTR ≤ 1e6."""
    for r in QUERIES["docs_simpson_diversity"](spark, SF_DIR).collect():
        assert 0 <= r.simpson_ppm < 1_000_000
        assert 0 < r.ttr_ppm <= 1_000_000
        assert r.n_types <= r.n_tokens


def test_chisq_matches_reference_python(spark):
    import math
    from collections import Counter

    from kafka_sink_spark.session import load_tables

    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    obs = Counter(
        (e.event_type, math.floor(e.value) // _BAND_WIDTH) for e in events
    )
    n = sum(obs.values())
    rt = Counter()
    ct = Counter()
    for (et, band), o in obs.items():
        rt[et] += o
        ct[band] += o
    expected = {
        (et, band): (
            o,
            (o * n - rt[et] * ct[band]) ** 2 * 1_000_000 // (n * rt[et] * ct[band]),
        )
        for (et, band), o in obs.items()
    }
    got = {
        (r.event_type, r.band): (r.obs, r.chisq_n_ppm)
        for r in QUERIES["events_chisq_contingency"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_chisq_cells_cover_all_events(spark):
    from kafka_sink_spark.session import load_tables

    n = load_tables(spark, SF_DIR, ("events",))["events"].count()
    rows = QUERIES["events_chisq_contingency"](spark, SF_DIR).collect()
    assert sum(r.obs for r in rows) == n


def test_shipping_sla_rates_consistent(spark):
    rows = QUERIES["orders_shipping_sla"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_within_7d <= r.n_within_30d <= r.n_orders
        assert r.sla7_ppm == r.n_within_7d * 1_000_000 // r.n_orders
        assert r.sla30_ppm == r.n_within_30d * 1_000_000 // r.n_orders


def test_shipping_sla_covers_every_order_once(spark):
    from kafka_sink_spark.session import load_tables

    t = load_tables(spark, SF_DIR, ("orders", "lineitem"))
    n_orders_with_lines = (
        t["lineitem"].select("l_orderkey").distinct().count()
    )
    rows = QUERIES["orders_shipping_sla"](spark, SF_DIR).collect()
    assert sum(r.n_orders for r in rows) == n_orders_with_lines
