"""Behavior invariants for the round-9c payload/split wave
(plans/analytics_payload.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import hashlib
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _log2_octave_ppm(x: int) -> int:
    assert x > 0
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


def _tdiv(a: int, b: int) -> int:
    return a // b if a >= 0 else -((-a) // b)


def test_payload_entropy_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    counts = Counter()
    for r in docs:
        payload = r["text"].encode("utf-8")
        assert len(payload) == len(r["text"])  # ASCII canary
        counts.update(payload)
    nn = sum(counts.values())
    got = {
        r["byte"]: r
        for r in QUERIES["multimodal_payload_entropy"](spark, SF_DIR).collect()
    }
    assert set(got) == set(counts) | {-1}
    h_total = 0
    for byte, c in counts.items():
        h = (c * (_log2_octave_ppm(nn) - _log2_octave_ppm(c))) // nn
        row = got[byte]
        assert row["cnt"] == c
        assert row["share_ppm"] == c * 1_000_000 // nn
        assert row["h_ppm_bits"] == h
        h_total += h
    star = got[-1]
    assert star["cnt"] == nn
    assert star["h_ppm_bits"] == h_total
    # ASCII text: entropy well below the 8-bit ceiling, above 1 bit
    assert 1_000_000 < h_total < 8_000_000


def _split_of(text: str) -> str:
    bucket = int(hashlib.md5(text.encode()).hexdigest()[:15], 16) % 100
    return "train" if bucket < 98 else ("val" if bucket == 98 else "test")


def test_js_divergence_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    tf = {s: Counter() for s in ("train", "val", "test")}
    for r in docs:
        tf[_split_of(r["text"])].update(re.findall(r"[a-z]+", r["text"].lower()))
    tot = {s: sum(c.values()) for s, c in tf.items()}
    got = {
        r["pair"]: r
        for r in QUERIES["docs_js_divergence_splits"](spark, SF_DIR).collect()
    }
    assert set(got) == {"train|val", "train|test", "val|test"}
    # r10 rebased convention: bounded ppm mixture-ratio log arguments
    # m2 = trunc(2e6·p/(p+q)) clamped to >=1, minus the octave log2 of
    # the 1e6 scale — never a count product inside a log.
    lg_1e6 = _log2_octave_ppm(1_000_000)
    for a, b in (("train", "val"), ("train", "test"), ("val", "test")):
        A, B = tot[a], tot[b]
        jsd = 0
        for term in set(tf[a]) | set(tf[b]):
            p, q = tf[a][term], tf[b][term]
            mix = p * B + q * A
            m2p = max((2_000_000 * p * B) // max(mix, 1), 1)
            m2q = max((2_000_000 * q * A) // max(mix, 1), 1)
            hp = (
                _tdiv(p * (_log2_octave_ppm(m2p) - lg_1e6), A)
                if p > 0
                else 0
            )
            hq = (
                _tdiv(q * (_log2_octave_ppm(m2q) - lg_1e6), B)
                if q > 0
                else 0
            )
            jsd += _tdiv(hp + hq, 2)  # both engines truncate toward zero
        row = got[f"{a}|{b}"]
        assert row["n_tokens_a"] == A and row["n_tokens_b"] == B
        assert row["jsd_ppm_bits"] == jsd, (a, b)
        # JSD is bounded by 1 bit (plus octave slack)
        assert row["jsd_ppm_bits"] < 1_100_000
