"""Round-6 wave: trained-codebook ANN and oracle-paired batch twins of the
streaming analytics operators.

- ``knn_pq_trained`` upgrades the PQ family from "shape-correct" (first-K
  stand-in codebook) to "algorithm-correct": real seeded Lloyd rounds as
  DataFrame ops, exact fixed-point arithmetic end-to-end (see
  extensions/similarity.py).
- ``stream_sessionize_twin`` / ``stream_interval_join_twin`` run the ACTUAL
  streaming/analytics.py operators on batch input (Spark executes
  ``session_window`` and the interval join identically in batch;
  ``withWatermark`` is a batch no-op) and pair them with DuckDB oracles —
  promoting the streaming surface from unit-pinned to driver-certified.
  NOTE the deliberate boundary semantics: ``session_window`` starts a NEW
  session when the gap is >= 30 min (windows [t, t+g) that merely touch do
  not merge), while the batch ``events_sessionize`` catalog query breaks on
  strictly > 30 min — the twin's oracle encodes the session_window rule.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.extensions import similarity
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables
from kafka_sink_spark.streaming.analytics import (
    interval_join_stream,
    sessionize_stream,
)

# --------------------------------------------------------------------------
# PQ ANN with a Lloyd-trained codebook
# --------------------------------------------------------------------------

_PQT_M = 8
_PQT_K = 16
_PQT_DIM = 64
_PQT_QUERIES = 10
_PQT_TOPK = 5
_PQT_ITERS = 2


def _pq_trained_oracle(
    m_subspaces: int = _PQT_M,
    k_codewords: int = _PQT_K,
    dim: int = _PQT_DIM,
    n_queries: int = _PQT_QUERIES,
    k: int = _PQT_TOPK,
    iterations: int = _PQT_ITERS,
) -> str:
    sub_len = dim // m_subspaces
    ctes = [
        f"""comp AS (
      SELECT vec_id AS vid, CAST(i // {sub_len} AS INTEGER) AS m,
             CAST(i % {sub_len} AS INTEGER) AS comp,
             CAST(round(embedding[i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS x
      FROM embeddings, unnest(range({dim})) AS u(i)
    )""",
        f"""c0 AS (
      SELECT m, CAST(vid AS INTEGER) AS j, comp, x AS c
      FROM comp WHERE vid < {k_codewords}
    )""",
    ]
    prev = "c0"
    for t in range(1, iterations + 1):
        ctes.append(
            f"""d{t} AS (
      SELECT p.vid, p.m, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {prev} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, p.m, c.j
    )"""
        )
        ctes.append(
            f"""a{t} AS (
      SELECT vid, m, j FROM (
        SELECT vid, m, j,
               row_number() OVER (PARTITION BY vid, m ORDER BY d, j) AS rn
        FROM d{t}) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{t} AS (
      SELECT p.m, a.j, p.comp, CAST(SUM(p.x) // COUNT(*) AS BIGINT) AS c
      FROM comp p JOIN a{t} a ON p.vid = a.vid AND p.m = a.m
      GROUP BY p.m, a.j, p.comp
    )"""
        )
        prev = f"c{t}"
    ctes.append(
        f"""df AS (
      SELECT p.vid, p.m, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {prev} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, p.m, c.j
    )"""
    )
    ctes.append(
        """codes AS (
      SELECT vid, m, j FROM (
        SELECT vid, m, j,
               row_number() OVER (PARTITION BY vid, m ORDER BY d, j) AS rn
        FROM df) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""qd AS (
      SELECT vid AS qid, m, j, d FROM df WHERE vid < {n_queries}
    )"""
    )
    ctes.append(
        """ad AS (
      SELECT q.qid AS query_id, c.vid AS neighbor_id, SUM(q.d) AS afix
      FROM codes c JOIN qd q ON q.m = c.m AND q.j = c.j AND q.qid <> c.vid
      GROUP BY 1, 2
    )"""
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT query_id, neighbor_id,
           round(CAST(afix AS DOUBLE) / 1000000000000.0, 6) AS adist, rank
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY afix, neighbor_id
             ) AS INTEGER) AS rank
      FROM ad
    ) WHERE rank <= {k}
    """
    )


@register("knn_pq_trained", oracle=_pq_trained_oracle())
def knn_pq_trained(spark, sf_dir):
    """PQ ANN with a codebook fit by {iters} real Lloyd rounds (seeded from
    the first-K subvectors), replacing knn_pq's untrained stand-in. Every
    quantity is an exact integer (fixed-point micro-units; integer means via
    truncating division, identical in Spark `div` and DuckDB `//`), so the
    trained fit and the final ADC ranking hash bit-identically cross-engine.

    Scale shape per Lloyd round: corpus-component rows × a BROADCAST M×K×
    sub_len codebook, two partial-combined aggregations — the canonical
    distributed k-means step; nothing is collected driver-side and no stage
    is O(n²). Encoding and query-ADC reuse the same broadcast pattern
    (plan-pinned by tests/test_plan_invariants.py)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.knn_pq_trained(
        emb,
        k=_PQT_TOPK,
        n_queries=_PQT_QUERIES,
        m_subspaces=_PQT_M,
        k_codewords=_PQT_K,
        dim=_PQT_DIM,
        iterations=_PQT_ITERS,
    )


# --------------------------------------------------------------------------
# Streaming operators, driver-certified via batch twins
# --------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000


@register(
    "stream_sessionize_twin",
    oracle=f"""
    WITH l AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pt
      FROM events
    ), s AS (
      SELECT user_id, ts,
             CASE WHEN pt IS NULL
                    OR epoch_us(ts) - epoch_us(pt) >= {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS brk
      FROM l
    ), g AS (
      SELECT user_id, ts,
             SUM(brk) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM s
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           epoch_us(MAX(ts)) + {_SESSION_GAP_US} AS session_end_us,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def stream_sessionize_twin(spark, sf_dir):
    """The streaming sessionize operator (streaming/analytics.py
    sessionize_stream: session_window + watermark), executed on batch input
    and oracle-paired — certifying the operator's exact merge semantics
    (new session when the inactivity gap is >= 30 min; session end = last
    event + gap) with an official driver row rather than only the unit suite.
    Scale shape: session_window is one shuffle on user_id with per-key merge
    — identical batch or streaming."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    out = sessionize_stream(events)
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.unix_micros(F.col("session_start")).alias("session_start_us"),
        F.unix_micros(F.col("session_end")).alias("session_end_us"),
        F.col("n_events"),
    )


@register(
    "stream_interval_join_twin",
    oracle="""
    WITH a AS (
      SELECT user_id, event_id AS anchor_id, ts
      FROM events WHERE event_type = 'purchase'
    ), p AS (
      SELECT user_id, event_id AS probe_id, ts
      FROM events WHERE event_type = 'click'
    )
    SELECT CAST(a.user_id AS BIGINT) AS user_id, a.anchor_id, p.probe_id,
           epoch_us(a.ts) - epoch_us(p.ts) AS gap_us
    FROM a JOIN p ON a.user_id = p.user_id
     AND p.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
    """,
)
def stream_interval_join_twin(spark, sf_dir):
    """The watermarked stream-stream interval join (streaming/analytics.py
    interval_join_stream), executed on batch input and oracle-paired: every
    purchase pairs with the same user's clicks in the preceding hour. The
    equi-key (user_id) drives the shuffle in both modes; the time predicate
    prunes state (streaming) / rows (batch) identically, so the batch result
    IS the streaming operator's complete-data output (unit-pinned equal in
    tests/test_streaming_analytics.py; this row makes it driver-certified).
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    anchors = events.filter(F.col("event_type") == "purchase")
    probes = events.filter(F.col("event_type") == "click")
    out = interval_join_stream(anchors, probes)
    return out.select(
        F.col("user_id").cast("bigint").alias("user_id"),
        "anchor_id",
        "probe_id",
        "gap_us",
    )
