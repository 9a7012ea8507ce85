"""Behavior + plan invariants for the round-8c manifest wave
(plans/analytics_manifest.py): chunk manifest, tokenizer fertility,
cluster size histogram, PageRank residuals.  Cross-engine equality is
covered by test_entry_oracle / tools/driver_check."""

import hashlib
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# multimodal_chunk_manifest
# ---------------------------------------------------------------------------


def test_chunk_manifest_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    want = {}
    for r in docs:
        payload = r["text"].encode("utf-8")
        n = (len(payload) + 255) // 256
        for i in range(n):
            chunk = payload[i * 256 : (i + 1) * 256]
            want[(r["doc_id"], i)] = (
                i * 256,
                len(chunk),
                hashlib.md5(chunk).hexdigest(),
                n,
            )
    got = {
        (r["asset_id"], r["chunk_idx"]): (
            r["byte_offset"],
            r["chunk_len"],
            r["chunk_md5"],
            r["n_chunks"],
        )
        for r in QUERIES["multimodal_chunk_manifest"](spark, SF_DIR).collect()
    }
    assert got == want
    # chunks must reassemble: per asset, offsets tile [0, blen)
    per_asset = defaultdict(list)
    for (aid, idx), (off, ln, _, _) in got.items():
        per_asset[aid].append((idx, off, ln))
    for aid, chunks in per_asset.items():
        chunks.sort()
        pos = 0
        for idx, off, ln in chunks:
            assert off == pos
            pos += ln


def test_chunk_manifest_no_shuffle(spark):
    plan = _plan(spark, "multimodal_chunk_manifest")
    assert "Exchange" not in plan  # pure projection + explode


# ---------------------------------------------------------------------------
# docs_tokenizer_fertility
# ---------------------------------------------------------------------------


def test_fertility_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    agg = defaultdict(lambda: [0, 0, 0])  # words, pretoks, bytes
    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    for r in docs:
        a = agg[r["source"]]
        a[0] += len([t for t in re.split(r"\s+", r["text"]) if t])
        a[1] += len(rx.findall(r["text"]))
        a[2] += len(r["text"].encode("utf-8"))
    got = {r["source"]: r for r in QUERIES["docs_tokenizer_fertility"](spark, SF_DIR).collect()}
    assert set(got) == set(agg)
    for src, (w, p, b) in agg.items():
        row = got[src]
        assert row["n_words"] == w
        assert row["n_pretokens"] == p
        assert row["fertility_ppm"] == (p * 1_000_000) // w
        assert row["bytes_per_pretoken_ppm"] == (b * 1_000_000) // p
        # pre-tokenizer only ever splits words further
        assert row["fertility_ppm"] >= 1_000_000


# ---------------------------------------------------------------------------
# dedup_cluster_size_histogram
# ---------------------------------------------------------------------------


def test_cluster_histogram_consistency(spark):
    # consistency against the certified cluster assignment query
    assign = QUERIES["dedup_clusters"](spark, SF_DIR).collect()
    sizes = Counter()
    for r in assign:
        sizes[r["cluster_id"]] += 1
    hist = Counter(sizes.values())
    n_docs = sum(sizes.values())
    got = {r["cluster_size"]: r for r in QUERIES["dedup_cluster_size_histogram"](spark, SF_DIR).collect()}
    assert {s: r["n_clusters"] for s, r in got.items()} == dict(hist)
    for s, r in got.items():
        assert r["n_docs"] == hist[s] * s
        assert r["dup_mass_ppm"] == (hist[s] * (s - 1) * 1_000_000) // n_docs


# ---------------------------------------------------------------------------
# parts_copurchase_pagerank_residual
# ---------------------------------------------------------------------------


def test_pagerank_residuals_contract(spark):
    rows = {r["iter"]: r for r in QUERIES["parts_copurchase_pagerank_residual"](spark, SF_DIR).collect()}
    assert set(rows) == {1, 2, 3}
    # a damped iteration must contract: residuals strictly shrink
    assert rows[1]["l1_residual"] > rows[2]["l1_residual"] > rows[3]["l1_residual"]
    assert rows[3]["residual_ppm"] < rows[1]["residual_ppm"]


def test_pagerank_residual_python_reference(spark):
    li = load_tables(spark, SF_DIR, ("lineitem",))["lineitem"].collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in by_order.values():
        for a in parts:
            for b in parts:
                if a != b:
                    edges.add((a, b))
    out = defaultdict(list)
    for a, b in edges:
        out[a].append(b)
    nodes = sorted(out)
    deg = {n: len(out[n]) for n in nodes}
    r = {n: 1_000_000 for n in nodes}
    want = []
    for it in range(1, 4):
        sums = defaultdict(int)
        for n in nodes:
            unit = r[n] // deg[n]
            for m in out[n]:
                sums[m] += unit
        nxt = {n: 150_000 + (85 * sums.get(n, 0)) // 100 for n in nodes}
        l1 = sum(abs(nxt[n] - r[n]) for n in nodes)
        mass = sum(r.values())
        want.append((it, l1, (l1 * 1_000_000) // mass))
        r = nxt
    got = sorted(
        (r2["iter"], r2["l1_residual"], r2["residual_ppm"])
        for r2 in QUERIES["parts_copurchase_pagerank_residual"](spark, SF_DIR).collect()
    )
    assert got == want
