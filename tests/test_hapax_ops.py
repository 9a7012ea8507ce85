"""Behavior invariants for the round-8j hapax wave
(plans/analytics_hapax.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hapax_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    per_src = defaultdict(Counter)
    for r in docs:
        for t in re.split(r"\s+", r["text"]):
            if t:
                per_src[r["source"]][t] += 1
    got = {r["source"]: r for r in QUERIES["corpus_hapax_ratio"](spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for src, c in per_src.items():
        hapax = sum(1 for v in c.values() if v == 1)
        row = got[src]
        assert row["n_types"] == len(c)
        assert row["n_tokens"] == sum(c.values())
        assert row["n_hapax"] == hapax
        assert row["hapax_type_ppm"] == (hapax * 1_000_000) // len(c)
        assert row["hapax_token_ppm"] == (hapax * 1_000_000) // sum(c.values())


def test_simhash_bit_balance_consistent_with_signatures(spark):
    # expand the certified signature groups back to per-doc multiplicity
    rows = QUERIES["dedup_simhash"](spark, SF_DIR).collect()
    per_bit = defaultdict(lambda: [0, 0])
    for r in rows:
        for b in range(16):
            cell = per_bit[b]
            cell[0] += ((r["simhash"] >> b) & 1) * r["n_docs"]
            cell[1] += r["n_docs"]
    got = {r["bit"]: r for r in QUERIES["docs_simhash_bit_balance"](spark, SF_DIR).collect()}
    assert set(got) == set(range(16))
    for b, (set_docs, n) in per_bit.items():
        row = got[b]
        assert row["set_docs"] == set_docs, b
        assert row["n_docs"] == n
        assert row["set_ppm"] == (set_docs * 1_000_000) // n
        assert row["imbalance_ppm"] == abs(row["set_ppm"] - 500_000)
