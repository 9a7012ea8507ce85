"""Behavior tests for the late-data certification twin
(plans/analytics_lateness.py). Cross-engine value equality is covered by
test_entry_oracle / tools/driver_check."""

import datetime
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_late_data_twin_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    max_ts = max(r.ts for r in ev)
    wm = max_ts - datetime.timedelta(hours=36)
    counts: Counter = Counter()
    sums: Counter = Counter()
    for r in ev:
        day = r.ts.date()
        # append mode emits a daily window iff its END precedes the
        # final watermark; late duplicates never contribute
        if datetime.datetime.combine(
            day + datetime.timedelta(days=1), datetime.time()
        ) < wm:
            key = (str(day), r.event_type)
            counts[key] += 1
            sums[key] += int(math.floor(r.value * 1_000_000))
    expected = {k: (counts[k], sums[k]) for k in counts}
    got = {
        (r.day, r.event_type): (r.n_events, r.sum_value_us)
        for r in QUERIES["stream_late_data_twin"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_late_data_twin_drops_and_withholds(spark):
    rows = QUERIES["stream_late_data_twin"](spark, SF_DIR).collect()
    assert rows
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    days = sorted({r.ts.date() for r in ev})
    ontime_day0 = sum(
        1 for r in ev if r.ts.date() == days[0] and r.event_type == rows[0].event_type
    )
    # the day-0 window must hold ON-TIME counts only (the re-keyed late
    # duplicates of the first 10 days were dropped, not doubled in)
    got_day0 = {
        r.event_type: r.n_events for r in rows if r.day == str(days[0])
    }
    per_type = Counter(
        r.event_type for r in ev if r.ts.date() == days[0]
    )
    assert got_day0 == dict(per_type)
    # windows the final watermark has not passed are withheld
    emitted_days = {r.day for r in rows}
    assert str(days[-1]) not in emitted_days
