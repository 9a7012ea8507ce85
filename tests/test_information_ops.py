"""Behavior invariants for the round-9b information/streaming wave
(plans/analytics_information.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

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
    """Truncating division (both engines' sign-split convention)."""
    return a // b if a >= 0 else -((-a) // b)


def test_stream_topk_twin_matches_batch_counts(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    counts = Counter(r["user_id"] for r in events)
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = sorted(
        QUERIES["stream_topk_twin"](spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["user_id"], r["n_events"]) for r in rows] == expect
    assert [r["rank"] for r in rows] == list(range(1, 11))


def test_info_gain_matches_reference_python(spark):
    events = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    th = Counter((r["event_type"], r["ts"].hour) for r in events)
    tt = Counter()
    ht = Counter()
    for (t, h), c in th.items():
        tt[t] += c
        ht[h] += c
    nn = sum(th.values())
    expect = {}
    for (t, h), c in th.items():
        # r10 bounded probability-ratio convention (1e12 fixed point,
        # clamped >=1): lg(P(hour|type)) - lg(P(hour))
        p_pt = max(c * 10**12 // tt[t], 1)
        q_pt = max(ht[h] * 10**12 // nn, 1)
        term = _tdiv(
            c * (_log2_octave_ppm(p_pt) - _log2_octave_ppm(q_pt)),
            nn,
        )
        expect[t] = expect.get(t, 0) + term
    got = {
        r["event_type"]: r
        for r in QUERIES["events_info_gain_by_hour"](spark, SF_DIR).collect()
    }
    assert set(got) == set(expect) | {"*"}
    for t, mi in expect.items():
        assert got[t]["mi_ppm_bits"] == mi, t
        assert got[t]["n_events"] == tt[t]
    assert got["*"]["mi_ppm_bits"] == sum(expect.values())
    assert got["*"]["n_events"] == nn


def test_sentence_dispersion_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    per_src: dict[str, list[int]] = {}
    for r in docs:
        for sent in re.split(r"[.!?]+", r["text"]):
            n = len([t for t in re.split(r"\s+", sent) if t])
            if n > 0:
                per_src.setdefault(r["source"], []).append(n)
    got = {
        r["source"]: r
        for r in QUERIES["docs_sentence_dispersion"](spark, SF_DIR).collect()
    }
    assert set(got) == set(per_src)
    for src, lens in per_src.items():
        n, s, sq = len(lens), sum(lens), sum(x * x for x in lens)
        row = got[src]
        assert row["n_sentences"] == n
        assert row["n_tokens"] == s
        assert row["mean_len_ppm"] == s * 1_000_000 // n
        assert row["dispersion_ppm"] == (n * sq - s * s) * 1_000_000 // (n * s)
        assert row["dispersion_ppm"] >= 0
