"""Behavior invariants for the round-9e tuning wave
(plans/analytics_tuning.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import hashlib
import os
import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.extensions.dedup import MINHASH_PRIME, minhash_params
from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.session import load_tables

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _signatures(docs, k=16):
    params = minhash_params(k)
    sigs = {}
    for r in docs:
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        if len(toks) >= 3:
            shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        else:
            shingles = {" ".join(toks)}
        hms = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MINHASH_PRIME
            for s in shingles
        ]
        sigs[r["doc_id"]] = [
            min((h * a + b) % MINHASH_PRIME for h in hms) for a, b in params
        ]
    return sigs


def test_band_tuning_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    sigs = _signatures(docs)
    got = {
        (r["bands"], r["rows_per_band"]): r
        for r in QUERIES["dedup_minhash_band_tuning"](spark, SF_DIR).collect()
    }
    assert set(got) == {(2, 8), (4, 4), (8, 2)}
    prev_cands = 0
    for bands, rows in ((2, 8), (4, 4), (8, 2)):
        buckets = defaultdict(list)
        for doc_id, sig in sigs.items():
            for b in range(bands):
                key = (b, ",".join(str(m) for m in sig[b * rows : (b + 1) * rows]))
                buckets[key].append(doc_id)
        cands = set()
        for members in buckets.values():
            ms = sorted(members)
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cands.add((ms[i], ms[j]))
        n_agree = sum(
            1
            for a, b in cands
            if sum(1 for x, y in zip(sigs[a], sigs[b]) if x == y) >= 8
        )
        row = got[(bands, rows)]
        assert row["n_candidates"] == len(cands), (bands, rows)
        assert row["n_agree"] == n_agree
        assert row["precision_ppm"] == n_agree * 1_000_000 // max(len(cands), 1)
        # more bands -> (weakly) more candidates
        assert row["n_candidates"] >= prev_cands
        prev_cands = row["n_candidates"]


def test_pq_distortion_matches_reference_python(spark):
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"].collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}
    cw = {j: vecs[j] for j in range(16)}
    sums = Counter()
    maxs = {}
    counts = Counter()
    for vid, v in vecs.items():
        for m in range(8):
            lo = m * 8
            best = min(
                round(
                    sum(
                        (v[i] - w[i]) ** 2 for i in range(lo, lo + 8)
                    )
                    * 1_000_000.0
                )
                for w in cw.values()
            )
            sums[m] += best
            counts[m] += 1
            maxs[m] = max(maxs.get(m, 0), best)
    got = {
        r["subspace"]: r
        for r in QUERIES["embedding_pq_distortion_by_subspace"](
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(range(8))
    for m in range(8):
        row = got[m]
        assert row["n_vecs"] == counts[m]
        assert row["total_dfix"] == sums[m]
        assert row["mean_dfix"] == sums[m] // counts[m]
        assert row["max_dfix"] == maxs[m]


def test_chunk_dedup_ratio_matches_reference_python(spark):
    docs = load_tables(spark, SF_DIR, ("documents",))["documents"].collect()
    copies = Counter()
    for r in docs:
        data = r["text"]
        for off in range(0, len(data), 256):
            copies[hashlib.md5(data[off : off + 256].encode()).hexdigest()] += 1
    hist = Counter(copies.values())
    n_hashes, n_chunks = len(copies), sum(copies.values())
    got = {
        r["copies"]: r
        for r in QUERIES["multimodal_chunk_dedup_ratio"](spark, SF_DIR).collect()
    }
    assert set(got) == set(hist) | {-1}
    for c, n in hist.items():
        row = got[c]
        assert row["n_hashes"] == n
        assert row["n_chunks"] == c * n
        assert row["savings_ppm"] == 0
    star = got[-1]
    assert star["n_hashes"] == n_hashes
    assert star["n_chunks"] == n_chunks
    assert star["savings_ppm"] == (n_chunks - n_hashes) * 1_000_000 // n_chunks
