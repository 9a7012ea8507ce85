"""Behavior tests for the round-7n readability/structure wave
(plans/analytics_readability.py): source entropy, Flesch readability,
ABC×XYZ matrix, rich-club coefficients. Cross-engine value equality is
covered by test_entry_oracle / tools/driver_check."""

import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_LOG2_1E6 = 19_931_568


def _tokens(text: str) -> list:
    return [t for t in re.split(r"\s+", text) if t]


def _olog2(x: int) -> int:
    lg = x.bit_length() - 1
    return lg * 1_000_000 + ((x - (1 << lg)) * 1_000_000) // (1 << lg)


# ---------------------------------------------------------------------------
# docs_source_entropy
# ---------------------------------------------------------------------------


def test_source_entropy_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    toks: Counter = Counter()
    for d in docs:
        toks[d.source] += len(_tokens(d.text))
    total = sum(toks.values())
    s = len(toks)
    h = 0
    for t in toks.values():
        p = t * 1_000_000 // total
        if p > 0:
            h += p * (_LOG2_1E6 - _olog2(p)) // 1_000_000
    hmax = _olog2(s)
    row = QUERIES["docs_source_entropy"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_sources,
        r.n_tokens,
        r.entropy_ppm_bits,
        r.hmax_ppm_bits,
        r.evenness_ppm,
    ) == (s, total, h, hmax, min(h * 1_000_000 // hmax, 1_000_000))


def test_source_entropy_evenness_high_for_balanced_sources(spark):
    r = QUERIES["docs_source_entropy"](spark, SF_DIR).collect()[0]
    # 20 equal-sized sources → near-perfect evenness (clamped at 1)
    assert 900_000 < r.evenness_ppm <= 1_000_000
    # octave bias bound: H can exceed Hmax by at most ~2*0.0861 bits
    assert r.entropy_ppm_bits <= r.hmax_ppm_bits + 180_000


# ---------------------------------------------------------------------------
# docs_flesch_readability
# ---------------------------------------------------------------------------


def test_flesch_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    agg: defaultdict = defaultdict(lambda: [0, 0, 0, 0])
    for d in docs:
        words = _tokens(d.text)
        sents = [x for x in re.split(r"[.!?]+", d.text) if x.strip()]
        syll = sum(
            max(len(re.findall(r"[aeiouyAEIOUY]+", w)), 1) for w in words
        )
        a = agg[d.source]
        a[0] += 1
        a[1] += len(words)
        a[2] += max(len(sents), 1)
        a[3] += syll
    expected = {}
    for src, (nd, w, sn, sy) in agg.items():
        fre = (
            206_835
            - (1015 * (w * 1_000_000 // sn)) // 1_000_000
            - (84_600 * (sy * 1_000_000 // w)) // 1_000_000
        )
        expected[src] = (nd, w, sn, sy, fre)
    got = {
        r.source: (r.n_docs, r.words, r.sentences, r.syllables, r.fre_milli)
        for r in QUERIES["docs_flesch_readability"](spark, SF_DIR).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# lineitem_abc_xyz
# ---------------------------------------------------------------------------


def test_abc_xyz_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    d0 = min(r.l_shipdate.date() for r in li)
    rev: Counter = Counter()
    weekly: defaultdict = defaultdict(Counter)
    for r in li:
        rev[r.l_partkey] += int(math.floor(r.l_extendedprice * 100))
        wk = (r.l_shipdate.date() - d0).days // 7
        weekly[r.l_partkey][wk] += int(math.floor(r.l_quantity))
    total = sum(rev.values())
    cum = 0
    abc = {}
    for pk, v in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += v
        abc[pk] = (
            "A" if cum * 100 <= 80 * total else ("B" if cum * 100 <= 95 * total else "C")
        )
    xyz = {}
    for pk, wks in weekly.items():
        qs = list(wks.values())
        n = len(qs)
        if n < 2:
            xyz[pk] = "Z"
            continue
        s, q2 = sum(qs), sum(q * q for q in qs)
        var_num = n * q2 - s * s
        if var_num * 1_000_000 <= 250_000 * s * s:
            xyz[pk] = "X"
        elif var_num * 1_000_000 <= 1_000_000 * s * s:
            xyz[pk] = "Y"
        else:
            xyz[pk] = "Z"
    cells: defaultdict = defaultdict(lambda: [0, 0])
    for pk in rev:
        key = (abc[pk], xyz[pk])
        cells[key][0] += 1
        cells[key][1] += rev[pk]
    expected = {
        k: (n, v, v * 1_000_000 // total) for k, (n, v) in cells.items()
    }
    got = {
        (r.abc, r.xyz): (r.n_parts, r.revenue_cents, r.share_ppm)
        for r in QUERIES["lineitem_abc_xyz"](spark, SF_DIR).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# parts_rich_club
# ---------------------------------------------------------------------------


def test_rich_club_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    nb = defaultdict(set)
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    nb[a].add(b)
    degs = sorted(len(ns) for ns in nb.values())
    n = len(degs)
    expected = {}
    for p in (75, 90):
        k = degs[((p * (n - 1)) // 100 + 1) - 1]
        rich = {v for v, ns in nb.items() if len(ns) > k}
        m = sum(1 for v in rich for w in nb[v] if w in rich)
        phi = (
            0
            if len(rich) < 2
            else m * 1_000_000 // (len(rich) * (len(rich) - 1))
        )
        expected[p] = (k, len(rich), m, phi)
    got = {
        r.pct: (r.degree_threshold, r.n_rich, r.edges_within, r.phi_ppm)
        for r in QUERIES["parts_rich_club"](spark, SF_DIR).collect()
    }
    assert got == expected


def test_rich_club_denser_than_graph(spark):
    rows = QUERIES["parts_rich_club"](spark, SF_DIR).collect()
    assert len(rows) == 2
    for r in rows:
        assert 0 <= r.phi_ppm <= 1_000_000
