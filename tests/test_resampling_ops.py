"""Behavior + plan invariants for the round-7i resampling wave
(plans/analytics_resampling.py): Poisson bootstrap CI, Cohen's kappa,
Gini decision stump, BFS depths, kNN reciprocity. Cross-engine value
equality is covered by test_entry_oracle / tools/driver_check."""

import hashlib
import math
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_POIS_CDF_PPM = (367879, 735758, 919698, 981011, 996340)


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _pois_count(u: int) -> int:
    for k, t in enumerate(_POIS_CDF_PPM):
        if u < t:
            return k
    return 5


# ---------------------------------------------------------------------------
# events_bootstrap_ci
# ---------------------------------------------------------------------------


def test_bootstrap_ci_matches_reference_python(spark):
    ev = load_tables(spark, SF_DIR, ("events",))["events"].collect()
    vals = [
        (r.event_id, int(math.floor(r.value * 1_000_000))) for r in ev
    ]
    n = len(vals)
    point = sum(c for _, c in vals) // n
    means = []
    for b in range(1, 41):
        s = m = 0
        for eid, c in vals:
            h = int(
                hashlib.md5(f"{eid}|{b}".encode()).hexdigest()[:15], 16
            )
            cnt = _pois_count(h % 1_000_000)
            s += cnt * c
            m += cnt
        if m > 0:
            means.append((s // m, b))
    means.sort()
    nb = len(means)
    lo = means[((25 * (nb - 1)) // 1000 + 1) - 1][0]
    hi = means[((975 * (nb - 1)) // 1000 + 1) - 1][0]
    row = QUERIES["events_bootstrap_ci"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.n, r.n_replicates, r.mean_us, r.ci_lo_us, r.ci_hi_us) == (
        n,
        nb,
        point,
        lo,
        hi,
    )


def test_bootstrap_ci_brackets_mean(spark):
    r = QUERIES["events_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert r.ci_lo_us <= r.ci_hi_us
    # a 95% percentile CI from n>=500 rows should bracket the point mean
    assert r.ci_lo_us <= r.mean_us <= r.ci_hi_us
    assert r.n_replicates == 40


# ---------------------------------------------------------------------------
# docs_cohens_kappa
# ---------------------------------------------------------------------------


def test_kappa_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    grid = Counter()
    for d in docs:
        toks = [t for t in re.split(r"\s+", d.text) if t]
        ra = 1 if len(toks) >= 100 else 0
        rb = 1 if len(set(toks)) * 2 >= len(toks) else 0
        grid[(ra, rb)] += 1
    n = sum(grid.values())
    n00, n01 = grid[(0, 0)], grid[(0, 1)]
    n10, n11 = grid[(1, 0)], grid[(1, 1)]
    agree = n00 + n11
    chance = (n00 + n01) * (n00 + n10) + (n10 + n11) * (n01 + n11)
    num = n * agree - chance
    den = n * n - chance
    kappa = (
        0
        if den == 0
        else (
            num * 1_000_000 // den
            if num >= 0
            else -((-num) * 1_000_000 // den)
        )
    )
    row = QUERIES["docs_cohens_kappa"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n,
        r.n00,
        r.n01,
        r.n10,
        r.n11,
        r.po_ppm,
        r.pe_ppm,
        r.kappa_ppm,
    ) == (
        n,
        n00,
        n01,
        n10,
        n11,
        agree * 1_000_000 // n,
        chance * 1_000_000 // (n * n),
        kappa,
    )


# ---------------------------------------------------------------------------
# lineitem_gini_split
# ---------------------------------------------------------------------------


def test_gini_split_matches_reference_python(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    vals = [
        (
            int(math.floor(r.l_extendedprice * 100)),
            1 if r.l_returnflag == "R" else 0,
        )
        for r in li
    ]
    lo = min(c for c, _ in vals)
    hi = max(c for c, _ in vals)
    width = (hi - lo) // 32 + 1
    n = len(vals)
    r_total = sum(y for _, y in vals)
    hist: defaultdict = defaultdict(lambda: [0, 0])
    for c, y in vals:
        b = (c - lo) // width
        hist[b][0] += 1
        hist[b][1] += y
    base = (
        n * 1_000_000
        - (r_total * r_total + (n - r_total) * (n - r_total))
        * 1_000_000
        // n
    ) // n
    best = None
    nl = rl = 0
    for b in sorted(hist):
        nl += hist[b][0]
        rl += hist[b][1]
        t = b + 1
        nr, rr = n - nl, r_total - rl
        if nl == 0 or nr == 0:
            continue
        imp = (
            n * 1_000_000
            - (rl * rl + (nl - rl) * (nl - rl)) * 1_000_000 // nl
            - (rr * rr + (nr - rr) * (nr - rr)) * 1_000_000 // nr
        ) // n
        cand = (imp, t, lo + t * width, nl, nr)
        if best is None or (imp, t) < (best[0], best[1]):
            best = cand
    imp, t, thr, nl, nr = best
    row = QUERIES["lineitem_gini_split"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.threshold_cents,
        r.n_left,
        r.n_right,
        r.impurity_ppm,
        r.baseline_ppm,
        r.gain_ppm,
    ) == (thr, nl, nr, imp, base, base - imp)


def test_gini_split_gain_nonnegative(spark):
    r = QUERIES["lineitem_gini_split"](spark, SF_DIR).collect()[0]
    assert r.gain_ppm >= 0  # splitting can only reduce weighted impurity
    assert 0 <= r.impurity_ppm <= 500_000  # binary Gini is bounded by 1/2


# ---------------------------------------------------------------------------
# parts_bfs_depths
# ---------------------------------------------------------------------------


def test_bfs_depths_matches_reference_python(spark):
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
    hub = min(nb, key=lambda v: (-len(nb[v]), v))
    depth = {hub: 0}
    frontier = {hub}
    for d in range(1, 5):
        nxt = set()
        for v in frontier:
            nxt |= nb[v]
        nxt -= set(depth)
        for v in nxt:
            depth[v] = d
        frontier = nxt
    counts = Counter(depth.values())
    expected = {d: counts.get(d, 0) for d in range(5)}
    expected[-1] = len(nb) - len(depth)
    got = {
        r.depth: r.n_nodes
        for r in QUERIES["parts_bfs_depths"](spark, SF_DIR).collect()
    }
    assert got == expected


# ---------------------------------------------------------------------------
# embedding_knn_reciprocity
# ---------------------------------------------------------------------------


def test_knn_reciprocity_matches_reference_python(spark):
    emb = (
        load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
        .filter("vec_id < 300")
        .collect()
    )
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in emb}
    ids = sorted(vecs)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nbm = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nbm), 6)

    edges = set()
    for q in ids:
        sims = sorted(
            ((cos(vecs[q], vecs[c]), c) for c in ids if c != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for _, c in sims:
            edges.add((q, c))
    mutual = sum(1 for (a, b) in edges if (b, a) in edges)
    indeg = Counter(b for _, b in edges)
    row = QUERIES["embedding_knn_reciprocity"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert (
        r.n_panel,
        r.k,
        r.n_edges,
        r.n_mutual,
        r.reciprocity_ppm,
        r.max_in_degree,
        r.n_antihubs,
    ) == (
        len(ids),
        5,
        len(edges),
        mutual,
        mutual * 1_000_000 // len(edges),
        max(indeg.values()),
        len(ids) - len(indeg),
    )
