"""Round-8h load / QA / stability wave.

- ``parts_return_rate_by_brand``  per-brand return rate with an exact
  two-proportion significance screen against the rest of the catalog:
  rate in ppm plus the cross-multiplied z² numerator/denominator
  comparison at α=5% — the brand-level quality alarm, no square root
  and no float ever taken.
- ``embedding_split_centroid_shift``  split-half stability of label
  centroids: the squared distance between the even-half and odd-half
  centroid of each label, normalized by the label's mean squared
  vector norm (ppm) — a label whose two halves disagree is either
  underpopulated or mislabeled, and its centroid is not a usable
  routing anchor.
- ``events_peak_to_mean``  peak-hour load factor per event type: max
  hourly count vs mean hourly count over the global span (ppm) — the
  capacity-planning companion to events_fano_factor (Fano measures
  dispersion, this measures the provisioning worst case).

Determinism per the package convention: integers / fixed-point
milli-components end-to-end, cross-multiplied compares, truncating
division.

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's QA/profile families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# Return rate by brand with two-proportion screen
# --------------------------------------------------------------------------

# chi-square(1) critical value at alpha=0.05, in ppm (3.841459 -> 3841459);
# the z^2 compare is cross-multiplied against it.
_Z2_CRIT_PPM = 3_841_459

_RETURN_ORACLE = f"""
    WITH li AS (
      SELECT p.p_brand AS brand,
             CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), b AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(ret) AS BIGINT) AS r
      FROM li GROUP BY brand
    ), g AS (
      SELECT SUM(n) AS tn, SUM(r) AS tr FROM b
    )
    SELECT b.brand, b.n, b.r,
           CAST(b.r * 1000000 // b.n AS BIGINT) AS rate_ppm,
           CAST((g.tr - b.r) * 1000000 // (g.tn - b.n) AS BIGINT)
             AS rest_rate_ppm,
           -- z^2 = (p1-p2)^2 / (p(1-p)(1/n1+1/n2)) cross-multiplied:
           -- reject iff (r1*n2 - r2*n1)^2 * tn^2 * 1e6
           --        > crit * tr*(tn-tr) * (n1+n2) * n1*n2
           CAST(CASE WHEN
             (CAST(b.r AS HUGEINT) * (g.tn - b.n)
              - (g.tr - b.r) * b.n) * (CAST(b.r AS HUGEINT) * (g.tn - b.n)
              - (g.tr - b.r) * b.n) * g.tn * g.tn * 1000000
             > CAST({_Z2_CRIT_PPM} AS HUGEINT) * g.tr * (g.tn - g.tr)
               * g.tn * b.n * (g.tn - b.n)
           THEN 1 ELSE 0 END AS INTEGER) AS significant_5pct
    FROM b, g
    """


@register("parts_return_rate_by_brand", oracle=_RETURN_ORACLE)
def parts_return_rate_by_brand(spark, sf_dir):
    """Per-brand return rate with an exact two-proportion z² screen
    against the rest of the catalog: rate_ppm, the complement cohort's
    rate, and a 5% significance verdict with the whole inequality
    cross-multiplied — (r₁n₂−r₂n₁)²·T²·1e6 > χ²crit·R(T−R)·T·n₁n₂ —
    so no pooled-variance float or square root ever appears.  The
    brand-level quality alarm: a significantly elevated return rate
    routes the brand to inspection.

    Scale shape: one fact-sized equi-join to the part dimension
    (unhinted — part scales with SF), a partial-combined per-brand
    rollup, then |brands|-bounded arithmetic with a single-row global
    broadcast.
    """
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].select("l_partkey", "l_returnflag").join(
        t["part"].select("p_partkey", "p_brand"),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    b = li.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("r"),
    )
    g = b.agg(F.sum("n").alias("tn"), F.sum("r").alias("tr"))
    d = "(CAST(r AS DECIMAL(38,0)) * (tn - n) - (tr - r) * n)"
    return b.crossJoin(F.broadcast(g)).select(
        "brand",
        "n",
        "r",
        F.expr("CAST(r * 1000000 div n AS BIGINT)").alias("rate_ppm"),
        F.expr("CAST((tr - r) * 1000000 div (tn - n) AS BIGINT)").alias(
            "rest_rate_ppm"
        ),
        F.expr(
            f"CAST(CASE WHEN {d} * {d} * tn * tn * 1000000"
            f" > CAST({_Z2_CRIT_PPM} AS DECIMAL(38,0)) * tr * (tn - tr)"
            " * tn * n * (tn - n)"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("significant_5pct"),
    )


# --------------------------------------------------------------------------
# Split-half centroid shift per label
# --------------------------------------------------------------------------

_CS_SCALE = 1000  # milli-quantized components (the power-iteration discipline)


def _centroid_shift_oracle(dim: int = 64) -> str:
    # per (label, half): component sums of milli-quantized vectors; the
    # squared centroid distance is cross-multiplied to clear the /n means:
    # dist2 ~ sum_d (s_e[d]*n_o - s_o[d]*n_e)^2 / (n_e*n_o)^2
    comp = ", ".join(
        f"SUM(CAST(FLOOR(embedding[{i}]::DOUBLE * {_CS_SCALE}) AS BIGINT))"
        f" AS s{i}" for i in range(1, dim + 1)
    )
    dist = " + ".join(
        f"(e.s{i}::HUGEINT * o.n - o.s{i}::HUGEINT * e.n)"
        f" * (e.s{i}::HUGEINT * o.n - o.s{i}::HUGEINT * e.n)"
        for i in range(1, dim + 1)
    )
    norm = " + ".join(
        f"CAST(FLOOR(embedding[{i}]::DOUBLE * {_CS_SCALE}) AS BIGINT)"
        f" * CAST(FLOOR(embedding[{i}]::DOUBLE * {_CS_SCALE}) AS BIGINT)"
        for i in range(1, dim + 1)
    )
    return f"""
    WITH h AS (
      SELECT label, vec_id % 2 AS half, embedding,
             {norm} AS nrm2
      FROM embeddings
    ), agg AS (
      SELECT label, half, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(nrm2) AS BIGINT) AS nrm2_sum, {comp}
      FROM h GROUP BY label, half
    ), e AS (SELECT * FROM agg WHERE half = 0),
    o AS (SELECT * FROM agg WHERE half = 1)
    SELECT CAST(e.label AS BIGINT) AS label,
           e.n AS n_even, o.n AS n_odd,
           CAST(({dist}) * 1000000
                // ((e.n::HUGEINT * o.n) * (e.n::HUGEINT * o.n)
                    * ((e.nrm2_sum + o.nrm2_sum) // (e.n + o.n)))
                AS BIGINT) AS shift_ppm
    FROM e JOIN o ON o.label = e.label
    """


@register("embedding_split_centroid_shift", oracle=_centroid_shift_oracle())
def embedding_split_centroid_shift(spark, sf_dir):
    """Split-half stability of label centroids: the squared distance
    between each label's even-half and odd-half centroid, normalized by
    the label's mean squared vector norm, in ppm.  Components are
    milli-quantized (the power-iteration discipline) and the /n means
    are cleared by cross-multiplication — (s_e·n_o − s_o·n_e)² over
    (n_e·n_o)² — so the statistic is exact integers end-to-end.  A
    label whose halves disagree has no usable centroid anchor
    (underpopulated or mislabeled); shift_ppm near zero certifies the
    silhouette/centroid queries' anchors are sampling-stable.

    Scale shape: one scan, a partial-combined (label, half) component
    rollup (2·|labels| rows × 64 sums), then constant-size arithmetic
    on the joined halves.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    dim = 64
    comp = [
        F.sum(
            F.expr(
                f"CAST(FLOOR(CAST(embedding[{i-1}] AS DOUBLE) * {_CS_SCALE})"
                " AS BIGINT)"
            )
        ).alias(f"s{i}")
        for i in range(1, dim + 1)
    ]
    nrm = " + ".join(
        f"CAST(FLOOR(CAST(embedding[{i-1}] AS DOUBLE) * {_CS_SCALE}) AS BIGINT)"
        f" * CAST(FLOOR(CAST(embedding[{i-1}] AS DOUBLE) * {_CS_SCALE}) AS BIGINT)"
        for i in range(1, dim + 1)
    )
    agg = (
        emb.select(
            "label",
            (F.col("vec_id") % 2).alias("half"),
            F.col("embedding"),
            F.expr(nrm).alias("nrm2"),
        )
        .groupBy("label", "half")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("nrm2").cast("long").alias("nrm2_sum"),
            *comp,
        )
    )
    e = agg.where(F.col("half") == 0).select(
        "label",
        F.col("n").alias("n_even"),
        F.col("nrm2_sum").alias("nrm2_e"),
        *[F.col(f"s{i}").alias(f"e{i}") for i in range(1, dim + 1)],
    )
    o = agg.where(F.col("half") == 1).select(
        "label",
        F.col("n").alias("n_odd"),
        F.col("nrm2_sum").alias("nrm2_o"),
        *[F.col(f"s{i}").alias(f"o{i}") for i in range(1, dim + 1)],
    )
    dist = " + ".join(
        f"(CAST(e{i} AS DECIMAL(38,0)) * n_odd - CAST(o{i} AS DECIMAL(38,0))"
        f" * n_even) * (CAST(e{i} AS DECIMAL(38,0)) * n_odd"
        f" - CAST(o{i} AS DECIMAL(38,0)) * n_even)"
        for i in range(1, dim + 1)
    )
    return e.join(o, "label").select(
        F.col("label").cast("long").alias("label"),
        "n_even",
        "n_odd",
        F.expr(
            f"CAST(({dist}) * 1000000"
            " div ((CAST(n_even AS DECIMAL(38,0)) * n_odd)"
            " * (CAST(n_even AS DECIMAL(38,0)) * n_odd)"
            " * ((nrm2_e + nrm2_o) div (n_even + n_odd))) AS BIGINT)"
        ).alias("shift_ppm"),
    )


# --------------------------------------------------------------------------
# Peak-to-mean load factor
# --------------------------------------------------------------------------

_PEAK_ORACLE = """
    WITH h AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, hr
    ), span AS (
      SELECT CAST(datediff('hour', MIN(date_trunc('hour', ts)),
                           MAX(date_trunc('hour', ts))) + 1 AS BIGINT) AS n
      FROM events
    ), agg AS (
      SELECT event_type, SUM(c) AS s, MAX(c) AS peak FROM h
      GROUP BY event_type
    )
    SELECT agg.event_type, CAST(agg.s AS BIGINT) AS n_events,
           CAST(agg.peak AS BIGINT) AS peak_hour_events,
           CAST(agg.peak * span.n * 1000000 // agg.s AS BIGINT)
             AS peak_to_mean_ppm
    FROM agg, span
    """


@register("events_peak_to_mean", oracle=_PEAK_ORACLE)
def events_peak_to_mean(spark, sf_dir):
    """Peak-hour load factor per event type: the busiest hour's count
    against the mean hourly count over the global span (zeros
    included), in ppm — peak·span div total.  This is the provisioning
    number (how much headroom the write path needs over steady state);
    events_fano_factor measures the same series' dispersion, this its
    worst case.

    Scale shape: the same (type, hour)-bounded rollup as the Fano
    probe, a single-row span broadcast, and a |types|-row readout.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    h = events.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count("*").cast("long").alias("c"))
    span = events.agg(
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            )
            / 3600
            + 1
        )
        .cast("long")
        .alias("sn")
    )
    agg = h.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("s"), F.max("c").cast("long").alias("peak")
    )
    return agg.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.col("s").alias("n_events"),
        F.col("peak").alias("peak_hour_events"),
        F.expr("CAST(peak * sn * 1000000 div s AS BIGINT)").alias(
            "peak_to_mean_ppm"
        ),
    )
