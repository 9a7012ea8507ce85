"""Behavior + plan invariants for the round-7e capstone
(plans/analytics_release.py): the composed release-audit pipeline."""

import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


def _gopher_pass(text: str, stopwords: set) -> bool:
    toks = _tokens(text)
    n = len(toks)
    nw = max(n, 1)
    mean_len = round(sum(len(t) for t in toks) / nw, 6)
    symbol = round(
        sum(1 for t in toks if t.startswith("#") or "..." in t) / nw, 6
    )
    alpha = round(
        sum(1 for t in toks if re.search("[a-z]", t.lower())) / nw, 6
    )
    n_stop = sum(1 for t in toks if t.lower() in stopwords)
    return (
        10 <= n <= 100_000
        and 3.0 <= mean_len <= 10.0
        and symbol < 0.1
        and alpha > 0.8
        and n_stop >= 2
    )


def _mattr_ppm(text: str, w: int = 25) -> int:
    toks = _tokens(text)
    length = len(toks)
    weff = min(w, length)
    n_win = length - weff + 1
    mass = sum(len(set(toks[s : s + weff])) for s in range(n_win))
    return mass * 1_000_000 // (weff * n_win)


def test_release_audit_matches_reference_python(spark):
    import hashlib

    from kafka_sink_spark.extensions.text import STOPWORDS

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    stopwords = {s.lower() for s in STOPWORDS}
    raw: Counter = Counter()
    passed = []
    for d in docs:
        raw[d.lang] += 1
        if _gopher_pass(d.text, stopwords):
            passed.append(d)
    n_quality: Counter = Counter()
    by_hash: dict = {}
    for d in passed:
        n_quality[d.lang] += 1
        h = hashlib.md5(d.text.encode()).hexdigest()
        if h not in by_hash or d.doc_id < by_hash[h].doc_id:
            by_hash[h] = d
    surv_by_lang = defaultdict(list)
    for d in by_hash.values():
        surv_by_lang[d.lang].append(_mattr_ppm(d.text))
    expected = {}
    for lang, n_raw in raw.items():
        mattrs = surv_by_lang.get(lang, [])
        n_unique = len(mattrs)
        expected[lang] = (
            n_raw,
            n_quality.get(lang, 0),
            n_unique,
            n_unique * 1_000_000 // n_raw,
            (sum(mattrs) // n_unique) if n_unique else 0,
        )
    got = {
        r.lang: (r.n_raw, r.n_quality, r.n_unique, r.retention_ppm,
                 r.mean_mattr_ppm)
        for r in QUERIES["pipeline_release_audit"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_release_audit_monotone_gates_and_plan(spark):
    rows = QUERIES["pipeline_release_audit"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_raw >= r.n_quality >= r.n_unique >= 0
        assert 0 <= r.retention_ppm <= 1_000_000
        if r.n_unique:
            assert 0 < r.mean_mattr_ppm <= 1_000_000
    plan = (
        QUERIES["pipeline_release_audit"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # dedup semi join must not carry a forced broadcast hint
    analyzed = (
        QUERIES["pipeline_release_audit"](spark, SF_DIR)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "ResolvedHint" not in analyzed
