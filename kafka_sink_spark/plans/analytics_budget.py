"""Round-10a mixture/budget curation wave.

- ``docs_unimax_budget``  UniMax-style per-source token budgeting
  (Chung et al. 2023, "UniMax: Fairer and More Effective Language
  Sampling"): under a fixed total token budget B with a per-source
  epoch cap E, small sources repeat up to E epochs while the largest
  sources are capped at the waterfilling fair share — the standard
  answer to "how many tokens from each source does the training mix
  take".  Implemented as closed-form threshold waterfilling: sort
  capacities (c·E) ascending, find the largest prefix that fits its
  fair share, cap the rest at tau = remaining div slots, and hand the
  integer remainder one token each to the largest capped sources
  (deterministic tie-break) — the sequential UniMax loop and this
  closed form agree up to that remainder convention, and the closed
  form is one bounded-grid window instead of a per-source loop.
- ``docs_mixture_reweight``  log-dampened mixture under a fixed token
  budget: requested_s = w_s·B div W with w_s = octave-log2(c_s) — the
  log-proportional dampening that plays the role of temperature
  sampling (a T→large limit), one-pass with no redistribution; capped
  sources report their deficit and the '*' row reports unspent budget.
- ``multimodal_dhash_neardup``  byte-level dHash near-dup candidates
  over the binary payload corpus (difference hash, Krawetz's public
  dHash construction): downsample the first 264 payload bytes into 33
  fixed 8-byte segment means (the "crop + resize" normalization a
  header-parser applies before any decode — no PIL), hash the 32
  adjacent-mean gradient signs, band the 32-bit hash into 4×8-bit
  LSH buckets, and report pairs at Hamming ≤ 2 — the pre-decode
  near-dup screen for blob pipelines.

Determinism per the package convention: exact integer token counts,
octave-log2 ppm-bits for the mixture weights (single-count log
arguments), truncating division, DECIMAL(38,0)/HUGEINT for any
count×ppm product, ties broken on ids/names.  The waterfilling grid
windows run over the SOURCE-bounded grid (|sources| rows — domain-,
not row-bounded; sanctioned in tests/test_plan_invariants.py).

Reference anchor: datastax/kafka-sink has no analytics surface
(SURVEY §2); these extend COVERAGE.md's curation/multimodal families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.analytics_readability import _DUCK_LOG2, _SPARK_LOG2
from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables, spread_small_scan

# UniMax epoch cap: a source may repeat at most E times (Chung 2023 §3
# uses small integer caps; E=4 keeps the sf-grade corpus interesting —
# budget 2·total against capacity 4·total guarantees a nonempty capped
# set at every SF).
_EPOCH_CAP = 4
_TOKEN_RE = "[a-z]+"


def _unimax_oracle() -> str:
    return f"""
    WITH tf AS (
      SELECT source,
             CAST(SUM(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')))
                  AS BIGINT) AS c
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(2 * SUM(c) AS BIGINT) AS budget
      FROM tf
    ), grid AS (
      SELECT source, c, c * {_EPOCH_CAP} AS cap,
             CAST(row_number() OVER (ORDER BY c * {_EPOCH_CAP} ASC, source ASC)
                  AS BIGINT) AS rk,
             CAST(SUM(c * {_EPOCH_CAP}) OVER (
               ORDER BY c * {_EPOCH_CAP} ASC, source ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS pfx
      FROM tf
    ), split AS (
      -- rank i takes FULL capacity iff cap_i fits the fair share of the
      -- budget left before allocating it: cap_i·(S−i+1) ≤ B − P_{{i−1}}
      SELECT COALESCE(MAX(CASE WHEN g.cap::HUGEINT * (t.s - g.rk + 1)
                                    <= t.budget - (g.pfx - g.cap)
                               THEN g.rk END), 0) AS kstar,
             COALESCE(MAX(CASE WHEN g.cap::HUGEINT * (t.s - g.rk + 1)
                                    <= t.budget - (g.pfx - g.cap)
                               THEN g.pfx END), 0) AS pk
      FROM grid g, tot t
    ), lvl AS (
      SELECT split.kstar, split.pk,
             CASE WHEN split.kstar < t.s
                  THEN (t.budget - split.pk) // (t.s - split.kstar)
                  ELSE 0 END AS tau,
             CASE WHEN split.kstar < t.s
                  THEN (t.budget - split.pk)
                       - ((t.budget - split.pk) // (t.s - split.kstar))
                         * (t.s - split.kstar)
                  ELSE 0 END AS rem,
             t.s, t.total, t.budget
      FROM split, tot t
    )
    SELECT g.source,
           g.c AS n_tokens,
           g.cap AS capacity_tokens,
           CAST(CASE WHEN g.rk <= l.kstar THEN g.cap
                     WHEN g.rk > l.s - l.rem THEN l.tau + 1
                     ELSE l.tau END AS BIGINT) AS alloc_tokens,
           CAST((CASE WHEN g.rk <= l.kstar THEN g.cap
                      WHEN g.rk > l.s - l.rem THEN l.tau + 1
                      ELSE l.tau END)::HUGEINT * 1000000 // g.c
             AS BIGINT) AS epochs_ppm,
           CAST(CASE WHEN g.rk <= l.kstar THEN 0 ELSE 1 END AS BIGINT)
             AS capped
    FROM grid g, lvl l
    ORDER BY g.source
    """


@register("docs_unimax_budget", oracle=_unimax_oracle())
def docs_unimax_budget(spark, sf_dir):
    """UniMax per-source token allocation (Chung 2023) under budget
    B = 2·total with epoch cap E = 4: closed-form threshold
    waterfilling over capacities c·E — sources whose capacity fits the
    running fair share take it all (small sources repeat up to E
    epochs), the rest are capped at tau = remaining div slots with the
    integer remainder handed +1 each to the largest capped sources.
    Σ alloc == B exactly.  epochs_ppm = alloc·1e6 div c reads "how many
    times this source is replayed" (1e6 = exactly once).

    Scale shape: ONE corpus-sized per-source token count (the only
    data-sized shuffle — token counting is a zero-explode projection);
    everything after lives on the |sources|-bounded grid, where the
    rank/prefix window is domain-bounded (sanctioned) and the split
    scalar broadcasts back.  cap·slots and alloc·1e6 products ride
    DECIMAL(38,0)/HUGEINT, so no count product has to fit int64.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tf = docs.groupBy("source").agg(
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_TOKEN_RE), 0
                )
            )
        )
        .cast("long")
        .alias("c")
    )
    # four consumers (grid, totals, split scalar, readout) — checkpoint
    # the |sources|-row rollup so the corpus scan runs ONCE (the
    # lineitem_theil_index drift-probe discipline)
    tf = tf.localCheckpoint(eager=True)
    tot = tf.agg(
        F.count("*").cast("long").alias("s"),
        F.sum("c").cast("long").alias("total"),
        (F.sum("c") * 2).cast("long").alias("budget"),
    )
    w = Window.orderBy(F.col("cap").asc(), F.col("source").asc())
    grid = tf.select(
        "source",
        "c",
        (F.col("c") * _EPOCH_CAP).alias("cap"),
    ).select(
        "source",
        "c",
        "cap",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("cap").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long").alias("pfx"),
    )
    g = grid.crossJoin(F.broadcast(tot))
    split = g.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.expr(
                        "CAST(cap AS DECIMAL(38,0)) * (s - rk + 1)"
                        " <= budget - (pfx - cap)"
                    ),
                    F.col("rk"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("kstar"),
        F.coalesce(
            F.max(
                F.when(
                    F.expr(
                        "CAST(cap AS DECIMAL(38,0)) * (s - rk + 1)"
                        " <= budget - (pfx - cap)"
                    ),
                    F.col("pfx"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("pk"),
    )
    lvl = split.crossJoin(F.broadcast(tot)).select(
        "kstar",
        "pk",
        "s",
        "budget",
        F.expr(
            "CASE WHEN kstar < s THEN (budget - pk) div (s - kstar)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("tau"),
        F.expr(
            "CASE WHEN kstar < s THEN (budget - pk)"
            " - ((budget - pk) div (s - kstar)) * (s - kstar)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("rem"),
    )
    out = grid.crossJoin(F.broadcast(lvl))
    alloc = (
        "CASE WHEN rk <= kstar THEN cap"
        " WHEN rk > s - rem THEN tau + 1 ELSE tau END"
    )
    return out.select(
        "source",
        F.col("c").alias("n_tokens"),
        F.col("cap").alias("capacity_tokens"),
        F.expr(f"CAST({alloc} AS BIGINT)").alias("alloc_tokens"),
        F.expr(
            f"CAST(CAST(({alloc}) AS DECIMAL(38,0)) * 1000000 div c"
            " AS BIGINT)"
        ).alias("epochs_ppm"),
        F.expr(
            "CAST(CASE WHEN rk <= kstar THEN 0 ELSE 1 END AS BIGINT)"
        ).alias("capped"),
    ).orderBy("source")


def _mixture_oracle() -> str:
    lg_c = _DUCK_LOG2.format(x="c")
    return f"""
    WITH tf AS (
      SELECT source,
             CAST(SUM(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')))
                  AS BIGINT) AS c
      FROM documents GROUP BY source
    ), wt AS (
      SELECT source, c, CAST({lg_c} AS BIGINT) AS w FROM tf
    ), tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total,
             CAST(SUM(c) // 2 AS BIGINT) AS budget,
             CAST(SUM(w) AS BIGINT) AS wsum
      FROM wt
    ), alloc AS (
      SELECT wt.source, wt.c, wt.w,
             CAST(wt.w::HUGEINT * t.budget // t.wsum AS BIGINT) AS requested,
             CAST(LEAST(wt.c, wt.w::HUGEINT * t.budget // t.wsum)
                  AS BIGINT) AS alloc,
             t.total, t.budget
      FROM wt, tot t
    ), rows_ AS (
      SELECT source, c AS n_tokens, w AS weight_ppm_bits,
             requested AS requested_tokens, alloc AS alloc_tokens,
             CAST(c::HUGEINT * 1000000 // total AS BIGINT)
               AS natural_share_ppm,
             CAST(alloc::HUGEINT * 1000000 // budget AS BIGINT)
               AS budget_share_ppm,
             CAST(CASE WHEN alloc < requested THEN 1 ELSE 0 END AS BIGINT)
               AS capped
      FROM alloc
    )
    SELECT * FROM rows_
    UNION ALL
    SELECT '*' AS source,
           CAST(SUM(n_tokens) AS BIGINT),
           CAST(SUM(weight_ppm_bits) AS BIGINT),
           CAST(SUM(requested_tokens) AS BIGINT),
           CAST(SUM(alloc_tokens) AS BIGINT),
           CAST(1000000 AS BIGINT),
           CAST(SUM(budget_share_ppm) AS BIGINT),
           CAST(SUM(capped) AS BIGINT)
    FROM rows_
    """


@register("docs_mixture_reweight", oracle=_mixture_oracle())
def docs_mixture_reweight(spark, sf_dir):
    """Log-dampened mixture reweighting under a fixed token budget
    B = total div 2: per-source weight w = octave-log2(c) ppm-bits (the
    log-proportional dampening that stands in for temperature
    sampling's T→large limit — a 100× bigger source asks for only
    ~6.6 more weight units), requested = w·B div W, allocation =
    min(c, requested) one-pass with NO redistribution — capped sources
    report capped=1 and the '*' total row makes the unspent budget
    visible (B − Σalloc).  Exact integers; the w·B product rides
    DECIMAL(38,0)/HUGEINT so the log-weight convention has no count
    cliff.

    Scale shape: one corpus-sized per-source token count, then pure
    |sources|-grid arithmetic under a single-row broadcast — no window
    at all.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tf = docs.groupBy("source").agg(
        F.sum(
            F.size(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(_TOKEN_RE), 0
                )
            )
        )
        .cast("long")
        .alias("c")
    )
    # two consumers (totals + per-source readout): checkpoint the
    # |sources|-row rollup so the corpus scan runs once
    tf = tf.localCheckpoint(eager=True)
    lg_c = _SPARK_LOG2.format(x="c")
    wt = tf.select("source", "c", F.expr(f"CAST({lg_c} AS BIGINT)").alias("w"))
    tot = wt.agg(
        F.sum("c").cast("long").alias("total"),
        F.expr("CAST(SUM(c) div 2 AS BIGINT)").alias("budget"),
        F.sum("w").cast("long").alias("wsum"),
    )
    a = wt.crossJoin(F.broadcast(tot)).select(
        "source",
        "c",
        "w",
        F.expr(
            "CAST(CAST(w AS DECIMAL(38,0)) * budget div wsum AS BIGINT)"
        ).alias("requested"),
        "total",
        "budget",
    ).select(
        "source",
        "c",
        "w",
        "requested",
        F.least(F.col("c"), F.col("requested")).alias("alloc"),
        "total",
        "budget",
    )
    rows = a.select(
        "source",
        F.col("c").alias("n_tokens"),
        F.col("w").alias("weight_ppm_bits"),
        F.col("requested").alias("requested_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        F.expr(
            "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"
        ).alias("natural_share_ppm"),
        F.expr(
            "CAST(CAST(alloc AS DECIMAL(38,0)) * 1000000 div budget"
            " AS BIGINT)"
        ).alias("budget_share_ppm"),
        F.expr(
            "CAST(CASE WHEN alloc < requested THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("capped"),
    )
    total_row = rows.agg(
        F.lit("*").alias("source"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("weight_ppm_bits").cast("long").alias("weight_ppm_bits"),
        F.sum("requested_tokens").cast("long").alias("requested_tokens"),
        F.sum("alloc_tokens").cast("long").alias("alloc_tokens"),
        F.lit(1000000).cast("long").alias("natural_share_ppm"),
        F.sum("budget_share_ppm").cast("long").alias("budget_share_ppm"),
        F.sum("capped").cast("long").alias("capped"),
    )
    return rows.unionByName(total_row)


# --------------------------------------------------------------------------
# Byte-level dHash near-dup candidates over binary payloads
# --------------------------------------------------------------------------

_DH_SEGS = 33  # 33 segment means -> 32 gradient bits
_DH_SEG_BYTES = 8  # fixed window: first 264 payload bytes
_DH_HAM_MAX = 2  # report pairs at Hamming <= 2
_DH_BANDS = 4  # 4 x 8-bit LSH bands: any pair at Hamming <= 3 shares one


def _dh_segs_spark(col: str) -> str:
    """33 fixed 8-byte segment means of the first 264 bytes of string
    column ``col`` (integer div; short payloads yield empty tail
    segments with mean 0) — materialized as ONE array column so the
    gradient pass reads it instead of re-deriving every mean per bit
    (inlining it twice per bit blows up the Catalyst expression tree
    and the codegen cost ~130×)."""
    lo = f"1 + CAST(j AS INT) * {_DH_SEG_BYTES}"
    hi = f"LEAST((CAST(j AS INT) + 1) * {_DH_SEG_BYTES}, length({col}))"
    mean = (
        f"CASE WHEN {lo} > {hi} THEN CAST(0 AS BIGINT)"
        f" ELSE aggregate(sequence({lo}, {hi}), CAST(0 AS BIGINT),"
        f" (acc, p) -> acc + ascii(substr({col}, p, 1)))"
        f" div CAST({hi} - ({lo}) + 1 AS BIGINT) END"
    )
    return f"transform(sequence(0, {_DH_SEGS - 1}), j -> {mean})"


# gradient pass over the materialized segment-mean array column `segs`
_DH_FROM_SEGS_SPARK = (
    f"aggregate(sequence(0, {_DH_SEGS - 2}), CAST(0 AS BIGINT),"
    f" (acc, j) -> acc + IF(element_at(segs, CAST(j AS INT) + 1)"
    f" > element_at(segs, CAST(j AS INT) + 2),"
    f" shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)), CAST(0 AS BIGINT)))"
)


def _dh_segs_duck(col: str) -> str:
    lo = f"1 + j * {_DH_SEG_BYTES}"
    hi = f"LEAST((j + 1) * {_DH_SEG_BYTES}, length({col}))"
    mean = (
        f"CASE WHEN {lo} > {hi} THEN 0"
        f" ELSE list_sum(list_transform(range({lo}, {hi} + 1),"
        f" p -> ascii(substr({col}, p, 1)))) // ({hi} - ({lo}) + 1) END"
    )
    return f"list_transform(range(0, {_DH_SEGS}), j -> {mean})"


_DH_FROM_SEGS_DUCK = (
    f"list_sum(list_transform(range(0, {_DH_SEGS - 1}),"
    f" j -> CASE WHEN segs[j + 1] > segs[j + 2]"
    f" THEN (1::BIGINT << j) ELSE 0 END))"
)


def _dhash_oracle() -> str:
    segs = _dh_segs_duck("text")
    return f"""
    WITH s AS (
      SELECT doc_id AS asset_id, {segs} AS segs FROM documents
    ), h AS (
      SELECT asset_id, CAST({_DH_FROM_SEGS_DUCK} AS BIGINT) AS dh
      FROM s
    )
    SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
           CAST(bit_count(xor(a.dh, b.dh)) AS BIGINT) AS hamming
    FROM h a JOIN h b ON a.asset_id < b.asset_id
    WHERE bit_count(xor(a.dh, b.dh)) <= {_DH_HAM_MAX}
    ORDER BY asset_a, asset_b
    """


@register("multimodal_dhash_neardup", oracle=_dhash_oracle())
def multimodal_dhash_neardup(spark, sf_dir):
    """Byte-level dHash near-dup candidates over the binary payload
    corpus (difference hash, Krawetz's public dHash construction, no
    decode library needed): the first 264 payload bytes downsample to
    33 fixed 8-byte segment means — the byte-stream analog of dHash's
    crop-and-resize — and the 32 adjacent-mean gradient signs form the
    hash; pairs at Hamming ≤ 2 are the near-dup candidates.  On the
    driver corpus this finds the planted suffix-edit near-dups at
    Hamming ≤ 2 while unrelated pairs center near 16 — a CANDIDATE
    screen (some gradient collisions pass; a content check downstream
    confirms), which is dHash's documented contract.

    Scale shape: the hash is one zero-shuffle codegen projection per
    payload (segment means and gradients are inline higher-order
    functions on the binary column — no explode, no Python).  Pairing
    is banded LSH, not all-pairs: the 32-bit hash splits into 4×8-bit
    bands (any pair at Hamming ≤ 3 shares at least one exact band by
    pigeonhole), candidates bucket-join per band and dedupe, and the
    Hamming verify runs on the candidate set only — the
    ``dedup_simhash`` scale discipline on the multimodal column.  The
    DuckDB oracle cross-checks with the exact all-pairs filter.
    """
    from kafka_sink_spark.extensions import multimodal

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # the 264-byte segment-mean aggregation is the CPU-heavy narrow stage
    # before the checkpoint — spread the single-row-group scan so it feeds
    # every core (guide §2.2; no-op at production scan widths)
    assets = multimodal.documents_as_assets(spread_small_scan(docs, spark))
    segs = _dh_segs_spark("CAST(payload AS STRING)")
    h = assets.select(
        F.col("asset_id"), F.expr(segs).alias("segs")
    ).select(
        "asset_id",
        F.expr(f"CAST({_DH_FROM_SEGS_SPARK} AS BIGINT)").alias("dh"),
    )
    # the band self-join reads h twice — checkpoint the (asset_id, dh)
    # table (16 bytes/row) so the payload scan + hash projection run
    # once, not once per join side
    h = h.localCheckpoint(eager=True)
    bands = h.select(
        "asset_id",
        "dh",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_DH_BANDS - 1}),"
                f" k -> named_struct('k', k,"
                f" 'band', shiftright(dh, CAST(k AS INT) * 8) & 255))"
            )
        ).alias("kb"),
    ).select("asset_id", "dh", F.col("kb.k").alias("k"), F.col("kb.band").alias("band"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k") == F.col("b.k"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("asset_a"),
            F.col("b.asset_id").alias("asset_b"),
            F.col("a.dh").alias("dh_a"),
            F.col("b.dh").alias("dh_b"),
        )
        .dropDuplicates(["asset_a", "asset_b"])
    )
    return (
        cand.select(
            "asset_a",
            "asset_b",
            F.expr("CAST(bit_count(dh_a ^ dh_b) AS BIGINT)").alias("hamming"),
        )
        .where(F.col("hamming") <= _DH_HAM_MAX)
        .orderBy("asset_a", "asset_b")
    )
