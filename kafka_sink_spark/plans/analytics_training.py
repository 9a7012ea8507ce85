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
from kafka_sink_spark.plans.stream_twin import finish_stream_twin
from kafka_sink_spark.session import load_tables, spread_small_scan
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
# IVF ANN with a Lloyd-trained coarse quantizer
# --------------------------------------------------------------------------

_IVFT_C = 8
_IVFT_NPROBE = 2
_IVFT_QUERIES = 10
_IVFT_TOPK = 5
_IVFT_ITERS = 2


def _ivf_trained_oracle(
    n_centroids: int = _IVFT_C,
    nprobe: int = _IVFT_NPROBE,
    dim: int = _PQT_DIM,
    n_queries: int = _IVFT_QUERIES,
    k: int = _IVFT_TOPK,
    iterations: int = _IVFT_ITERS,
) -> str:
    ctes = [
        f"""comp AS (
      SELECT vec_id AS vid, CAST(i AS INTEGER) AS comp,
             CAST(round(embedding[i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS x
      FROM embeddings, unnest(range({dim})) AS u(i)
    )""",
        f"""c0 AS (
      SELECT CAST(vid AS INTEGER) AS j, comp, x AS c
      FROM comp WHERE vid < {n_centroids}
    )""",
    ]
    prev = "c0"
    for t in range(1, iterations + 1):
        ctes.append(
            f"""d{t} AS (
      SELECT p.vid, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {prev} c ON p.comp = c.comp
      GROUP BY p.vid, c.j
    )"""
        )
        ctes.append(
            f"""a{t} AS (
      SELECT vid, j FROM (
        SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM d{t}) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{t} AS (
      SELECT a.j, p.comp, CAST(SUM(p.x) // COUNT(*) AS BIGINT) AS c
      FROM comp p JOIN a{t} a ON p.vid = a.vid
      GROUP BY a.j, p.comp
    )"""
        )
        prev = f"c{t}"
    ctes.append(
        f"""df AS (
      SELECT p.vid, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {prev} c ON p.comp = c.comp
      GROUP BY p.vid, c.j
    )"""
    )
    ctes.append(
        """cells AS (
      SELECT vid AS neighbor_id, j AS cell FROM (
        SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM df) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT vid AS query_id, j AS cell FROM (
        SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM df WHERE vid < {n_queries}) WHERE rn <= {nprobe}
    )"""
    )
    ctes.append(
        """cand AS (
      SELECT p.query_id, c.neighbor_id
      FROM probes p JOIN cells c ON p.cell = c.cell
      WHERE p.query_id <> c.neighbor_id
    )"""
    )
    ctes.append(
        """pd AS (
      SELECT cd.query_id, cd.neighbor_id, SUM((q.x - v.x) * (q.x - v.x)) AS dfix
      FROM cand cd
      JOIN comp q ON q.vid = cd.query_id
      JOIN comp v ON v.vid = cd.neighbor_id AND v.comp = q.comp
      GROUP BY 1, 2
    )"""
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT query_id, neighbor_id,
           round(CAST(dfix AS DOUBLE) / 1000000000000.0, 6) AS dist, rank
    FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY dfix, neighbor_id
             ) AS INTEGER) AS rank
      FROM pd
    ) WHERE rank <= {k}
    """
    )


@register("knn_ivf_trained", oracle=_ivf_trained_oracle())
def knn_ivf_trained(spark, sf_dir):
    """IVF ANN with a coarse quantizer fit by real Lloyd rounds — the
    trained twin of knn_ivf, sharing the exact fixed-point machinery with
    knn_pq_trained (full-dim vectors are one 'subspace'). Queries probe
    their nprobe nearest trained cells; candidates re-rank by exact
    squared-L2. Training is corpus × broadcast centroids per round; the
    candidate join is cell-bucketed — at 100 TB the cell id is the natural
    partition key for the vector table and only ~nprobe/C of the corpus is
    scored per query."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.knn_ivf_trained(
        emb,
        k=_IVFT_TOPK,
        n_queries=_IVFT_QUERIES,
        n_centroids=_IVFT_C,
        nprobe=_IVFT_NPROBE,
        dim=_PQT_DIM,
        iterations=_IVFT_ITERS,
    )


# --------------------------------------------------------------------------
# Exact-arithmetic distributed anomaly flags (3-sigma without floats)
# --------------------------------------------------------------------------


@register(
    "events_value_outliers",
    oracle="""
    WITH b AS (
      SELECT event_id, event_type, value,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS xm
      FROM events
    ), st AS (
      SELECT event_type, COUNT(*) AS n, SUM(xm) AS s,
             SUM(CAST(xm AS HUGEINT) * xm) AS q
      FROM b GROUP BY event_type
    )
    SELECT b.event_id, b.event_type, b.value,
           round(CAST(st.s AS DOUBLE) / st.n / 1000000.0, 6) AS mean_value,
           round(CAST(st.n * st.q - CAST(st.s AS HUGEINT) * st.s AS DOUBLE)
                 / st.n / st.n / 1000000000000.0, 6) AS variance_value,
           CAST(
             (CAST(st.n AS HUGEINT) * b.xm - st.s)
               * (CAST(st.n AS HUGEINT) * b.xm - st.s)
             > 9 * (st.n * st.q - CAST(st.s AS HUGEINT) * st.s)
           AS INTEGER) AS is_outlier
    FROM b JOIN st USING (event_type)
    """,
)
def events_value_outliers(spark, sf_dir):
    """Per-type 3-sigma outlier flags computed ENTIRELY in exact integer
    arithmetic: with fixed-point values x (micro-units), n, S = Σx and
    Q = Σx², the condition |x − S/n| > 3σ is equivalent to
    (n·x − S)² > 9·(n·Q − S²) — no float mean/stddev ever crosses an
    engine or partition boundary, so the flag is bit-deterministic (Spark
    decimal(38,0) ≙ DuckDB HUGEINT for the wide products). The reported
    mean/variance are single-division doubles from exact integers, rounded.

    Scale shape: one partial-combined aggregation onto the tiny event_type
    keyspace, a broadcast stats join back, then a pure projection — the
    z-score pattern that survives any row count without a window or a
    second scan."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    b = events.select(
        "event_id",
        "event_type",
        "value",
        F.floor(F.col("value") * 1_000_000).cast("bigint").alias("xm"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    st = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("s"),
        F.sum(dec(F.col("xm")) * dec(F.col("xm"))).alias("q"),
    )
    j = b.join(F.broadcast(st), "event_type")
    dev = dec(F.col("n")) * dec(F.col("xm")) - dec(F.col("s"))
    var_num = dec(F.col("n")) * F.col("q") - dec(F.col("s")) * dec(F.col("s"))
    return j.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("s").cast("double") / F.col("n") / 1e6, 6).alias("mean_value"),
        F.round(
            var_num.cast("double") / F.col("n") / F.col("n") / 1e12, 6
        ).alias("variance_value"),
        F.when(dev * dev > F.lit(9) * var_num, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_outlier"),
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


# --------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + product-quantized residuals (the composed index)
# --------------------------------------------------------------------------

_IVFPQ_COARSE_ITERS = 2
_IVFPQ_PQ_ITERS = 1


def _ivf_pq_ctes(
    n_centroids: int = _IVFT_C,
    nprobe: int = _IVFT_NPROBE,
    m_subspaces: int = _PQT_M,
    k_codewords: int = _PQT_K,
    dim: int = _PQT_DIM,
    n_queries: int = _PQT_QUERIES,
    coarse_iterations: int = _IVFPQ_COARSE_ITERS,
    pq_iterations: int = _IVFPQ_PQ_ITERS,
) -> list:
    """CTE chain ending in ``ad`` (query_id, neighbor_id, afix) — shared by
    the knn_ivf_pq oracle and the recall-evaluation oracle."""
    sub_len = dim // m_subspaces
    ctes = [
        f"""comp AS (
      SELECT vec_id AS vid, CAST(i AS INTEGER) AS comp,
             CAST(round(embedding[i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS x
      FROM embeddings, unnest(range({dim})) AS u(i)
    )""",
        f"""c0 AS (
      SELECT CAST(vid AS INTEGER) AS j, comp, x AS c
      FROM comp WHERE vid < {n_centroids}
    )""",
    ]
    prev = "c0"
    for t in range(1, coarse_iterations + 1):
        ctes.append(
            f"""d{t} AS (
      SELECT p.vid, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {prev} c ON p.comp = c.comp
      GROUP BY p.vid, c.j
    )"""
        )
        ctes.append(
            f"""a{t} AS (
      SELECT vid, j FROM (
        SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM d{t}) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""c{t} AS (
      SELECT a.j, p.comp, CAST(SUM(p.x) // COUNT(*) AS BIGINT) AS c
      FROM comp p JOIN a{t} a ON p.vid = a.vid
      GROUP BY a.j, p.comp
    )"""
        )
        prev = f"c{t}"
    coarse = prev
    ctes.append(
        f"""cdf AS (
      SELECT p.vid, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM comp p JOIN {coarse} c ON p.comp = c.comp
      GROUP BY p.vid, c.j
    )""",
    )
    ctes.append(
        """cells AS (
      SELECT vid, j AS cell FROM (
        SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM cdf) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""res AS (
      SELECT p.vid, cl.cell,
             CAST(p.comp // {sub_len} AS INTEGER) AS m,
             CAST(p.comp % {sub_len} AS INTEGER) AS comp,
             p.x - cc.c AS x
      FROM comp p
      JOIN cells cl ON p.vid = cl.vid
      JOIN {coarse} cc ON cc.j = cl.cell AND cc.comp = p.comp
    )"""
    )
    ctes.append(
        f"""p0 AS (
      SELECT m, CAST(vid AS INTEGER) AS j, comp, x AS c
      FROM res WHERE vid < {k_codewords}
    )"""
    )
    prev = "p0"
    for t in range(1, pq_iterations + 1):
        ctes.append(
            f"""pd{t} AS (
      SELECT p.vid, p.m, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM res p JOIN {prev} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, p.m, c.j
    )"""
        )
        ctes.append(
            f"""pa{t} AS (
      SELECT vid, m, j FROM (
        SELECT vid, m, j,
               row_number() OVER (PARTITION BY vid, m ORDER BY d, j) AS rn
        FROM pd{t}) WHERE rn = 1
    )"""
        )
        ctes.append(
            f"""pc{t} AS (
      SELECT p.m, a.j, p.comp, CAST(SUM(p.x) // COUNT(*) AS BIGINT) AS c
      FROM res p JOIN pa{t} a ON p.vid = a.vid AND p.m = a.m
      GROUP BY p.m, a.j, p.comp
    )"""
        )
        prev = f"pc{t}"
    pq = prev
    ctes.append(
        f"""pqdf AS (
      SELECT p.vid, p.m, c.j, SUM((p.x - c.c) * (p.x - c.c)) AS d
      FROM res p JOIN {pq} c ON p.m = c.m AND p.comp = c.comp
      GROUP BY p.vid, p.m, c.j
    )"""
    )
    ctes.append(
        """codes AS (
      SELECT vid AS neighbor_id, m, j FROM (
        SELECT vid, m, j,
               row_number() OVER (PARTITION BY vid, m ORDER BY d, j) AS rn
        FROM pqdf) WHERE rn = 1
    )"""
    )
    ctes.append(
        f"""probes AS (
      SELECT vid AS query_id, j AS cell FROM (
        SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY d, j) AS rn
        FROM cdf WHERE vid < {n_queries}) WHERE rn <= {nprobe}
    )"""
    )
    ctes.append(
        f"""qres AS (
      SELECT q.vid AS query_id, pr.cell,
             CAST(q.comp // {sub_len} AS INTEGER) AS m,
             CAST(q.comp % {sub_len} AS INTEGER) AS comp,
             q.x - cc.c AS qx
      FROM comp q
      JOIN probes pr ON q.vid = pr.query_id
      JOIN {coarse} cc ON cc.j = pr.cell AND cc.comp = q.comp
    )"""
    )
    ctes.append(
        f"""adc AS (
      SELECT r.query_id, r.cell, r.m, c.j,
             SUM((r.qx - c.c) * (r.qx - c.c)) AS qd
      FROM qres r JOIN {pq} c ON c.m = r.m AND c.comp = r.comp
      GROUP BY 1, 2, 3, 4
    )"""
    )
    ctes.append(
        """cand AS (
      SELECT p.query_id, p.cell, c.vid AS neighbor_id
      FROM probes p JOIN cells c ON p.cell = c.cell
      WHERE p.query_id <> c.vid
    )"""
    )
    ctes.append(
        """ad AS (
      SELECT cd.query_id, cd.neighbor_id, SUM(a.qd) AS afix
      FROM cand cd
      JOIN codes co ON co.neighbor_id = cd.neighbor_id
      JOIN adc a ON a.query_id = cd.query_id AND a.cell = cd.cell
               AND a.m = co.m AND a.j = co.j
      GROUP BY 1, 2
    )"""
    )
    return ctes


def _ivf_pq_oracle(k: int = _PQT_TOPK) -> str:
    return (
        "\n    WITH "
        + ",\n    ".join(_ivf_pq_ctes())
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


@register("knn_ivf_pq", oracle=_ivf_pq_oracle())
def knn_ivf_pq(spark, sf_dir):
    """IVF-PQ — the composed two-level index production ANN systems run at
    100 TB (coarse quantizer routes, product-quantized RESIDUALS score):
    both levels Lloyd-trained with the shared exact fixed-point machinery,
    so cell assignment, residual codebook, codes and the final ADC ranking
    all hash bit-identically cross-engine. Queries recompute their residual
    per probed cell (asymmetric distance), matching the published IVFADC
    formulation (Jégou et al., PAMI 2011).

    Scale shape: two broadcast-centroid training loops + one encode pass;
    candidates are cell-bucketed (~nprobe/C of the corpus per query); the
    compressed code table is M bytes/vector. No O(n²) stage, no driver-side
    collect (plan-pinned by tests/test_plan_invariants.py)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    return similarity.knn_ivf_pq(
        emb,
        k=_PQT_TOPK,
        n_queries=_PQT_QUERIES,
        n_centroids=_IVFT_C,
        nprobe=_IVFT_NPROBE,
        m_subspaces=_PQT_M,
        k_codewords=_PQT_K,
        dim=_PQT_DIM,
        coarse_iterations=_IVFPQ_COARSE_ITERS,
        pq_iterations=_IVFPQ_PQ_ITERS,
    )


# --------------------------------------------------------------------------
# Language identification: Cavnar–Trenkle n-gram rank profiles
# --------------------------------------------------------------------------

_LID_P = 40  # profile length (top-P grams) and the out-of-place penalty


def _language_id_oracle(p: int = _LID_P) -> str:
    return f"""
    WITH g AS (
      SELECT doc_id, lang, substr(text, CAST(i AS INTEGER), 2) AS gram
      FROM documents, unnest(range(1, length(text))) AS u(i)
      WHERE length(text) >= 2
    ), dg AS (
      SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
    ), dr AS (
      SELECT doc_id, gram, r FROM (
        SELECT doc_id, gram, CAST(row_number() OVER (
                 PARTITION BY doc_id ORDER BY cnt DESC, gram) AS BIGINT) AS r
        FROM dg) WHERE r <= {p}
    ), lg AS (
      SELECT lang, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2
    ), lr AS (
      SELECT lang, gram, r FROM (
        SELECT lang, gram, CAST(row_number() OVER (
                 PARTITION BY lang ORDER BY cnt DESC, gram) AS BIGINT) AS r
        FROM lg) WHERE r <= {p}
    ), langs AS (
      SELECT DISTINCT lang FROM documents
    ), dist AS (
      SELECT d.doc_id, l.lang AS cand_lang,
             CAST(SUM(CASE WHEN p.r IS NULL THEN {p}
                           ELSE ABS(d.r - p.r) END) AS BIGINT) AS dist
      FROM dr d
      CROSS JOIN langs l
      LEFT JOIN lr p ON p.lang = l.lang AND p.gram = d.gram
      GROUP BY 1, 2
    ), best AS (
      SELECT doc_id, cand_lang AS pred_lang, dist FROM (
        SELECT *, row_number() OVER (
                 PARTITION BY doc_id ORDER BY dist, cand_lang) AS rn
        FROM dist) WHERE rn = 1
    )
    SELECT b.doc_id, doc.lang AS true_lang, b.pred_lang, b.dist,
           CAST(b.pred_lang = doc.lang AS INTEGER) AS is_correct
    FROM best b JOIN documents doc ON doc.doc_id = b.doc_id
    """


@register("docs_language_id", oracle=_language_id_oracle())
def docs_language_id(spark, sf_dir):
    """Language identification via Cavnar–Trenkle rank profiles (the
    published n-gram method: 'N-Gram-Based Text Categorization', SDAIR-94):
    per-language character-bigram profiles are TRAINED FROM THE CORPUS
    (top-P grams per labeled language, count-desc / gram-asc rank), each
    document builds its own top-P profile, and the predicted language is
    the one minimizing the out-of-place distance Σ|rank_doc − rank_lang|
    with the standard flat penalty P for out-of-profile grams. Every
    quantity is an integer (counts, ranks, penalties), so prediction and
    distance hash bit-identically cross-engine. On this synthetic corpus
    the text is shared-vocabulary across labels — the per-doc rows report
    is_correct honestly rather than claiming separability the data lacks.

    Scale shape: gram explode → one (doc, gram) partial-combined count +
    doc-keyed window for doc profiles; the language profile table is
    (langs × P) rows — trained with one tiny-keyspace agg and BROADCAST
    both into the 5-row candidate fan-out and the rank lookup; the
    distance agg shuffles on (doc, lang). No stage exceeds corpus-linear
    work and the final argmin is a doc-keyed window."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from pyspark.sql import Window

    p = _LID_P
    # The bigram explode (~500 grams/doc) and its map-side partial counts
    # run before any exchange: spread the single-row-group scan so that
    # narrow stage parallelizes (guide §2.2).
    g = spread_small_scan(docs, spark).filter(F.length("text") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 1), i -> substring(text, i, 2))")
        ).alias("gram"),
    )
    dg = g.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    wd = Window.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    dr = (
        dg.withColumn("r", F.row_number().over(wd).cast("bigint"))
        .filter(F.col("r") <= p)
        .select("doc_id", "gram", "r")
    )
    lg = g.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    wl = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    lr = (
        lg.withColumn("r", F.row_number().over(wl).cast("bigint"))
        .filter(F.col("r") <= p)
        .select(F.col("lang").alias("cand_lang"), "gram", F.col("r").alias("lr"))
    )
    langs = docs.select(F.col("lang").alias("cand_lang")).distinct()
    dist = (
        dr.crossJoin(F.broadcast(langs))
        .join(F.broadcast(lr), ["cand_lang", "gram"], "left")
        .groupBy("doc_id", "cand_lang")
        .agg(
            F.sum(
                F.when(F.col("lr").isNull(), F.lit(p)).otherwise(
                    F.abs(F.col("r") - F.col("lr"))
                )
            ).alias("dist")
        )
    )
    wb = Window.partitionBy("doc_id").orderBy(F.col("dist").asc(), F.col("cand_lang").asc())
    best = (
        dist.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), "dist")
    )
    return best.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        "pred_lang",
        "dist",
        (F.col("pred_lang") == F.col("lang")).cast("int").alias("is_correct"),
    )


# --------------------------------------------------------------------------
# Streaming dedup, driver-certified by executing the REAL streaming query
# --------------------------------------------------------------------------

_STREAM_DEDUP_RUNS = iter(range(1_000_000))


@register(
    "stream_dedup_twin",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
    FROM events
    """,
)
def stream_dedup_twin(spark, sf_dir):
    """The streaming exact-dedup operator (streaming/analytics.py
    dedup_stream: dropDuplicatesWithinWatermark), certified by EXECUTING the
    real streaming query — batch mode does not support the operator, so this
    twin stages the events table twice into a file source (a literal
    at-least-once replay, the duplicate class the reference sink produces),
    replays it with trigger(availableNow=True), and returns the memory-sink
    result. Replayed rows are exact duplicates, so the survivor is
    deterministic and the output must hash-equal the original events table —
    if the operator ever failed to drop the replay, the row count doubles
    and the driver comparison fails loudly.

    Scale shape: dedup state is keyed by event_id and expires at the
    watermark — state is bounded by the duplicate horizon, not the stream
    length; the shuffle is the same single event_id exchange batch dedup
    would run."""
    import tempfile

    events = load_tables(spark, sf_dir, ("events",))["events"]
    sel = events.select("event_id", "ts", "user_id", "event_type", "value")
    src = tempfile.mkdtemp(prefix="stream_dedup_src_")
    sel.write.mode("overwrite").parquet(src)
    # the replay's second copy is BY CONSTRUCTION byte-identical rows —
    # duplicate the staged files at the filesystem level instead of
    # re-running the events scan + write a second time (guide §1.2)
    import os as _os
    import shutil as _shutil

    for f in sorted(_os.listdir(src)):
        if f.endswith(".parquet"):
            _shutil.copy(
                _os.path.join(src, f), _os.path.join(src, f"dup-{f}")
            )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    from kafka_sink_spark.streaming.analytics import dedup_stream

    name = f"stream_dedup_twin_{next(_STREAM_DEDUP_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_dedup_ck_")
    q = (
        dedup_stream(stream, ["event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    result = spark.table(name).select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))


# --------------------------------------------------------------------------
# ANN quality evaluation: recall@k of the composed index vs exact top-k
# --------------------------------------------------------------------------


def _ivf_pq_recall_oracle(
    k: int = _PQT_TOPK, n_queries: int = _PQT_QUERIES
) -> str:
    ctes = _ivf_pq_ctes()
    ctes.append(
        f"""ann AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY afix, neighbor_id) AS rn
        FROM ad) WHERE rn <= {k}
    )"""
    )
    ctes.append(
        f"""ex AS (
      SELECT q.vid AS query_id, v.vid AS neighbor_id,
             SUM((q.x - v.x) * (q.x - v.x)) AS d
      FROM comp q JOIN comp v ON v.comp = q.comp AND v.vid <> q.vid
      WHERE q.vid < {n_queries}
      GROUP BY 1, 2
    )"""
    )
    ctes.append(
        f"""ex5 AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id, row_number() OVER (
                 PARTITION BY query_id ORDER BY d, neighbor_id) AS rn
        FROM ex) WHERE rn <= {k}
    )"""
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT e.query_id, CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_overlap,
           round(COUNT(a.neighbor_id) / {k}.0, 6) AS recall_at_k
    FROM ex5 e
    LEFT JOIN ann a ON a.query_id = e.query_id
                   AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """
    )


@register("knn_ivf_pq_recall", oracle=_ivf_pq_recall_oracle())
def knn_ivf_pq_recall(spark, sf_dir):
    """ANN quality evaluation: recall@{k} of the composed IVF-PQ index
    against EXACT fixed-point top-{k} — the measure-don't-guess harness
    every production ANN deployment runs before trusting an index
    (nprobe/M/K tuning is a recall-vs-cost trade; this query is the recall
    side of that curve). Both rankings share tie-breaking (low neighbor
    id), so the overlap count is deterministic and hashes cross-engine.
    On this synthetic corpus recall is intrinsically low (isotropic random
    vectors have no cluster structure, and nprobe/C = 1/4 of the corpus
    bounds what cell-probing can reach) — the point is the harness, which
    reports that honestly rather than a cherry-picked number.

    Scale shape: the exact side is one broadcast-query linear corpus scan
    (ground truth over a QUERY SAMPLE — n_queries × corpus, never corpus²);
    the ANN side reuses the knn_ivf_pq pipeline; the comparison is a
    (query, neighbor)-keyed left join of two k-row-per-query tables."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ann = similarity.knn_ivf_pq(
        emb,
        k=_PQT_TOPK,
        n_queries=_PQT_QUERIES,
        n_centroids=_IVFT_C,
        nprobe=_IVFT_NPROBE,
        m_subspaces=_PQT_M,
        k_codewords=_PQT_K,
        dim=_PQT_DIM,
        coarse_iterations=_IVFPQ_COARSE_ITERS,
        pq_iterations=_IVFPQ_PQ_ITERS,
    ).select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    exact = similarity.knn_exact_fixed(
        emb, k=_PQT_TOPK, n_queries=_PQT_QUERIES, dim=_PQT_DIM
    )
    return (
        exact.join(ann, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("_hit").alias("n_overlap"))
        .select(
            "query_id",
            F.col("n_overlap").cast("bigint").alias("n_overlap"),
            F.round(F.col("n_overlap") / float(_PQT_TOPK), 6).alias("recall_at_k"),
        )
    )


# --------------------------------------------------------------------------
# Remaining streaming operators, driver-certified
# --------------------------------------------------------------------------


@register(
    "stream_hourly_rollup_twin",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS bucket_start_us, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
             AS sum_value_millionths
    FROM events GROUP BY 1, 2
    """,
)
def stream_hourly_rollup_twin(spark, sf_dir):
    """The streaming tumbling-window rollup (streaming/analytics.py
    hourly_rollup_stream: 1-hour window + watermark), executed on batch
    input and oracle-paired — the window STRUCT grouping and integer-ized
    sum are identical batch or streaming, so this row certifies the
    operator the availableNow replays exercise in the unit suite. Scale
    shape: one partial-combined aggregation on (window, event_type); the
    watermark bounds streaming state to ~2h of open windows."""
    events = load_tables(spark, sf_dir, ("events",))["events"]
    from kafka_sink_spark.streaming.analytics import hourly_rollup_stream

    return hourly_rollup_stream(events).select(
        F.unix_micros(F.col("bucket_start")).alias("bucket_start_us"),
        "event_type",
        "n_events",
        "sum_value_millionths",
    )


_STREAM_PROFILE_RUNS = iter(range(1_000_000))


@register(
    "stream_profile_twin",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events_total,
           MAX(event_id) AS last_event_id
    FROM events GROUP BY user_id
    """,
)
def stream_profile_twin(spark, sf_dir):
    """The CUSTOM STATEFUL operator (streaming/analytics.py
    running_user_profile: applyInPandasWithState, per-user state tuple,
    update mode), certified by executing the real streaming query —
    applyInPandasWithState does not run in batch, so this twin replays the
    events table with trigger(availableNow=True) and reduces the update-mode
    emissions to the final state per user (running totals are monotone, so
    max() IS the last emission). The oracle is the plain batch aggregate the
    final state must equal on complete data.

    Scale shape: state is one tuple per user (bounded by key cardinality,
    not stream length); Arrow batches keep the Python hop vectorized; the
    only shuffle is the user_id exchange any per-user aggregate needs."""
    import tempfile

    events = load_tables(spark, sf_dir, ("events",))["events"]
    sel = events.select("user_id", "event_id")
    src = tempfile.mkdtemp(prefix="stream_profile_src_")
    sel.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("user_id long, event_id long").parquet(src)
    from kafka_sink_spark.streaming.analytics import running_user_profile

    name = f"stream_profile_twin_{next(_STREAM_PROFILE_RUNS)}"
    ck = tempfile.mkdtemp(prefix="stream_profile_ck_")
    q = (
        running_user_profile(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    result = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events_total").alias("n_events_total"),
            F.max("last_event_id").alias("last_event_id"),
        )
    )
    return finish_stream_twin(spark, q, name, result, (src, ck))
