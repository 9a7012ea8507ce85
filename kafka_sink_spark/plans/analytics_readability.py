"""Round-7n wave: corpus information measures, readability, inventory
segmentation, and core-elite graph structure — four more published
techniques in the catalog's exact-integer, oracle-twinned style.

- ``docs_source_entropy``  Shannon entropy + Pielou evenness of the
  token mass across sources, computed WITHOUT any transcendental call:
  log2 uses the catalog's octave interpolation (integer part from the
  bit length, linear fraction within the octave — ≤0.0861-bit error,
  identical in both engines), each −p·log2 p term is truncated to a
  ppm integer BEFORE the order-independent sum.  H near log2(S) says
  the corpus is evenly sourced; J = H / log2(S) normalizes it.
- ``docs_flesch_readability``  Flesch Reading Ease (Flesch 1948) per
  source with the standard implementation-grade syllable proxy (vowel
  groups, floor 1 per word) and sentence splits on [.!?] runs — the
  coefficients 206.835 / 1.015 / 84.6 pinned in fixed-point, the whole
  score an exact integer chain.  The classic prose-difficulty signal
  a curation pipeline bands on.
- ``lineitem_abc_xyz``  the ABC×XYZ inventory matrix: revenue classes
  (A/B/C at 80/95% cumulative, the orders_abc_classification pattern)
  crossed with demand-variability classes (X/Y/Z at CV² ≤ 0.25 / ≤ 1.0
  over weekly quantities, exact cross-multiplied CV²) — the 9-cell
  segmentation behind stocking policy, census + revenue share per cell.
- ``parts_rich_club``  rich-club coefficients (Colizza et al. 2006):
  among the nodes above the p75 / p90 degree thresholds (nearest-rank,
  self-adapting to any SF), the fraction of possible edges actually
  present — φ → 1 means the hubs form a near-clique, the "elite
  interconnection" diagnostic beside assortativity.

Determinism per the package convention: integer arithmetic end-to-end,
octave-interpolated log2 with per-term ppm truncation before sums,
pinned fixed-point coefficient tables, nearest-rank thresholds.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

_LOG2_1E6_PPM = 19_931_568  # log2(1e6) in ppm, truncated — pinned

# octave-interpolated log2 of a positive BIGINT x, in ppm-bits:
# (bitlen-1)*1e6 + ((x - 2^(bitlen-1)) * 1e6) div 2^(bitlen-1)
#
# The within-octave remainder can be up to 2^62, so its ×1e6 interpolation
# multiply runs in DECIMAL(38,0) / HUGEINT — bit-identical to the former
# BIGINT path on every argument that path could represent, but valid for
# ANY positive int64 argument instead of overflowing past x ≈ 2^43 (the
# sf10 rehearsal caught lineitem_theil_index's rev·n crossing that line;
# every counts-product user of these helpers had the same cliff).
# Arguments themselves must still fit a signed int64 — callers building
# products (c·N, rev·n) own THAT bound and document it.
_SPARK_LOG2 = (
    "((length(bin({x})) - 1) * 1000000"
    " + CAST((CAST(({x} - shiftleft(CAST(1 AS BIGINT), length(bin({x})) - 1))"
    " AS DECIMAL(38,0))"
    " * 1000000) div shiftleft(CAST(1 AS BIGINT), length(bin({x})) - 1)"
    " AS BIGINT))"
)
_DUCK_LOG2 = (
    "((length(bin({x})) - 1) * 1000000"
    " + CAST((({x} - (1::BIGINT << (length(bin({x})) - 1)))::HUGEINT"
    " * 1000000) // (1::BIGINT << (length(bin({x})) - 1)) AS BIGINT))"
)


def octave_log2_ppm(x: int) -> int:
    """The same octave-interpolated log2 in Python — used only to pin
    shared constants that both engines must reproduce exactly."""
    e = x.bit_length() - 1
    return e * 1_000_000 + ((x - (1 << e)) * 1_000_000) // (1 << e)


# --------------------------------------------------------------------------
# Bounded probability-ratio convention (r10) for the KL/MI/G²/Theil family.
#
# Every log in that family is a log of a RATIO of two probabilities that
# are close to each other under the null (independence / uniformity /
# no-keyness).  Computing lg(count-product) − lg(count-product) overflows
# int64 at large corpora, and the r10 interim fix — decomposing into four
# single-count logs — is overflow-free but loses the octave-bias
# CANCELLATION the ratio enjoys (near-null terms drifted tens of
# thousands of ppm-bits negative).  The pinned convention is therefore:
# render each probability in fixed-point 1e12 scale
# (p_pt = count·1e12 div total, clamped ≥ 1 so the log is defined;
# DECIMAL(38,0)/HUGEINT multiply) and take lg(p_pt) − lg(q_pt):
# - arguments are BOUNDED by 1e12 — no int64 cliff at any corpus size;
# - p ≈ q ⇒ same octave position ⇒ the interpolation biases cancel and
#   near-null terms read ~0, keeping MI/KL/G²/Theil near-zero-positive;
# - quantization: a probability below 1e-12 truncates to the clamp and
#   its log reads 0 — such terms carry weight < 1e-12 of the mass, so
#   the sum error is bounded by ~lg(total)·1e-12 bits.
# --------------------------------------------------------------------------

RATIO_SCALE = 1_000_000_000_000  # 1e12 fixed-point probability scale
LOG2_OCT_RATIO_SCALE = octave_log2_ppm(RATIO_SCALE)


def spark_ratio_pt(num: str, den: str) -> str:
    """count/total in 1e12 fixed point, clamped ≥ 1 (Spark SQL text)."""
    return (
        f"GREATEST(CAST(CAST({num} AS DECIMAL(38,0)) * {RATIO_SCALE}"
        f" div {den} AS BIGINT), CAST(1 AS BIGINT))"
    )


def duck_ratio_pt(num: str, den: str) -> str:
    return (
        f"GREATEST(CAST(({num})::HUGEINT * {RATIO_SCALE}"
        f" // ({den}) AS BIGINT), 1)"
    )

# --------------------------------------------------------------------------
# Source entropy + Pielou evenness
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = rf"""
    WITH tc AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS nt
      FROM documents
    ), per_src AS (
      SELECT source, SUM(nt) AS toks FROM tc GROUP BY source
    ), tot AS (SELECT SUM(toks) AS total,
                      CAST(COUNT(*) AS BIGINT) AS s FROM per_src),
    p AS (
      SELECT per_src.source, per_src.toks * 1000000 // tot.total AS p_ppm
      FROM per_src, tot
    ), terms AS (
      SELECT SUM(p_ppm * ({_LOG2_1E6_PPM}
                 - {_DUCK_LOG2.format(x="p_ppm")}) // 1000000) AS h_ppm
      FROM p WHERE p_ppm > 0
    )
    SELECT tot.s AS n_sources, CAST(tot.total AS BIGINT) AS n_tokens,
           CAST(terms.h_ppm AS BIGINT) AS entropy_ppm_bits,
           CAST({_DUCK_LOG2.format(x="tot.s")} AS BIGINT) AS hmax_ppm_bits,
           -- the octave bias raises H and lowers Hmax (each by <=0.0861
           -- bits), so the ratio can nominally exceed 1 on near-uniform
           -- distributions: clamp to keep J a proper evenness in [0, 1]
           CAST(LEAST(terms.h_ppm * 1000000
                      // {_DUCK_LOG2.format(x="tot.s")}, 1000000)
             AS BIGINT) AS evenness_ppm
    FROM tot, terms
    """


@register("docs_source_entropy", oracle=_ENTROPY_ORACLE)
def docs_source_entropy(spark, sf_dir):
    """Shannon entropy of the token mass across sources, with Pielou's
    evenness J = H / log2(S) — the information-theoretic "is the corpus
    dominated by a few sources" number beside the Simpson index (which
    the catalog computes log-free).  log2 never calls a transcendental:
    the octave interpolation (bit-length integer part + linear
    fraction, ≤0.0861-bit error — the corpus_zipf_alpha device) is
    applied identically in both engines, and each −p·log2 p term is
    truncated to a ppm integer BEFORE the sum, keeping the total
    order-independent and bit-identical.  The bias raises H and lowers
    Hmax, so J is CLAMPED at 1e6 ppm (near-uniform distributions would
    otherwise nominally exceed 1 — documented, not hidden).

    Scale shape: per-document token counts are a zero-shuffle
    projection; source masses partial-combine on the source key; the
    entropy sum runs over the SOURCE-bounded grid with a single-row
    total broadcast.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    per_src = (
        docs.select(
            "source",
            F.size(text_ops.tokens(F.col("text"))).cast("long").alias("nt"),
        )
        .groupBy("source")
        .agg(F.sum("nt").alias("toks"))
    )
    tot = per_src.agg(
        F.sum("toks").cast("long").alias("total"),
        F.count("*").cast("long").alias("s"),
    )
    p = per_src.crossJoin(F.broadcast(tot)).select(
        F.expr("toks * 1000000 div total").alias("p_ppm"), "s", "total"
    )
    lg_p = _SPARK_LOG2.format(x="p_ppm")
    terms = p.filter(F.col("p_ppm") > 0).agg(
        F.max("s").alias("s"),
        F.max("total").alias("total"),
        F.sum(
            F.expr(f"p_ppm * ({_LOG2_1E6_PPM} - {lg_p}) div 1000000")
        )
        .cast("long")
        .alias("h_ppm"),
    )
    lg_s = _SPARK_LOG2.format(x="s")
    return terms.select(
        F.col("s").alias("n_sources"),
        F.col("total").alias("n_tokens"),
        F.col("h_ppm").alias("entropy_ppm_bits"),
        F.expr(f"CAST({lg_s} AS BIGINT)").alias("hmax_ppm_bits"),
        # octave bias raises H and lowers Hmax — clamp J into [0, 1]
        F.expr(
            f"CAST(LEAST(h_ppm * 1000000 div {lg_s}, 1000000) AS BIGINT)"
        ).alias("evenness_ppm"),
    )


# --------------------------------------------------------------------------
# Flesch Reading Ease per source
# --------------------------------------------------------------------------

_FLESCH_ORACLE = r"""
    WITH d AS (
      SELECT source,
             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
                                  x -> x <> '')) AS BIGINT) AS words,
             CAST(GREATEST(len(list_filter(
                    regexp_split_to_array(text, '[.!?]+'),
                    x -> trim(x) <> '')), 1) AS BIGINT) AS sentences,
             CAST(COALESCE(list_sum(list_transform(
                    list_filter(regexp_split_to_array(text, '\s+'),
                                t -> t <> ''),
                    w -> GREATEST(len(regexp_extract_all(w,
                                        '[aeiouyAEIOUY]+')), 1))), 0)
               AS BIGINT) AS syllables
      FROM documents
    ), g AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(words) AS BIGINT) AS words,
             CAST(SUM(sentences) AS BIGINT) AS sentences,
             CAST(SUM(syllables) AS BIGINT) AS syllables
      FROM d GROUP BY source
    )
    SELECT source, n_docs, words, sentences, syllables,
           CAST(206835
                - (1015 * (words * 1000000 // sentences)) // 1000000
                - (84600 * (syllables * 1000000 // words)) // 1000000
             AS BIGINT) AS fre_milli
    FROM g
    """


@register("docs_flesch_readability", oracle=_FLESCH_ORACLE)
def docs_flesch_readability(spark, sf_dir):
    """Flesch Reading Ease per source (Flesch 1948):
    FRE = 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word),
    with the standard implementation-grade SYLLABLE PROXY (vowel-group
    runs per word, floored at 1 — documented; non-Latin scripts bottom
    out at 1/word) and sentences split on [.!?] runs (floored at 1).
    Coefficients are pinned integers and the score is emitted in
    milli-points via an exact fixed-point chain (the 1.015 term keeps
    its sub-milli remainder), so both engines agree bit-for-bit.
    Classic bands: ≥60k milli reads easy, ≤30k is academic prose.

    Scale shape: words/sentences/syllables are zero-shuffle per-document
    projections (one regexp pass each over the already-staged text);
    the rollup partial-combines on the source key; the score arithmetic
    is grid-sized.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = text_ops.tokens(F.col("text"))
    d = docs.select(
        "source",
        F.size(toks).cast("long").alias("words"),
        F.greatest(
            F.size(
                F.filter(
                    F.split(F.col("text"), r"[.!?]+"),
                    lambda x: F.trim(x) != F.lit(""),
                )
            ),
            F.lit(1),
        )
        .cast("long")
        .alias("sentences"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, w: acc
            + F.greatest(
                F.size(
                    F.regexp_extract_all(
                        w, F.lit(r"[aeiouyAEIOUY]+"), F.lit(0)
                    )
                ),
                F.lit(1),
            ).cast("long"),
        ).alias("syllables"),
    )
    g = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("words"),
        F.sum("sentences").cast("long").alias("sentences"),
        F.sum("syllables").cast("long").alias("syllables"),
    )
    return g.select(
        "source",
        "n_docs",
        "words",
        "sentences",
        "syllables",
        F.expr(
            "CAST(206835"
            " - (1015 * (words * 1000000 div sentences)) div 1000000"
            " - (84600 * (syllables * 1000000 div words)) div 1000000"
            " AS BIGINT)"
        ).alias("fre_milli"),
    )


# --------------------------------------------------------------------------
# ABC × XYZ inventory matrix
# --------------------------------------------------------------------------

_AXYZ_BUCKET = 100_000  # cents per revenue-prefix bucket
_X_CV2_PPM = 250_000  # CV <= 0.5
_Y_CV2_PPM = 1_000_000  # CV <= 1.0


_AXYZ_ORACLE = f"""
    WITH base AS (
      SELECT l_partkey AS pk,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(FLOOR(l_quantity) AS BIGINT) AS qty,
             date_diff('day', (SELECT MIN(CAST(l_shipdate AS DATE))
                               FROM lineitem),
                       CAST(l_shipdate AS DATE)) // 7 AS wk
      FROM lineitem
    ), pr AS (
      SELECT pk, SUM(cents) AS rev FROM base GROUP BY pk
    ), tot AS (SELECT SUM(rev) AS total FROM pr),
    cum AS (
      SELECT pk, rev,
             SUM(rev) OVER (ORDER BY rev DESC, pk
               ROWS UNBOUNDED PRECEDING) AS cum_rev
      FROM pr
    ), abc AS (
      SELECT pk, rev,
             CASE WHEN cum_rev * 100 <= 80 * tot.total THEN 'A'
                  WHEN cum_rev * 100 <= 95 * tot.total THEN 'B'
                  ELSE 'C' END AS abc
      FROM cum, tot
    ), weekly AS (
      SELECT pk, wk, SUM(qty) AS q FROM base GROUP BY pk, wk
    ), xyz AS (
      SELECT pk,
             CASE WHEN COUNT(*) < 2 THEN 'Z'
                  WHEN (COUNT(*) * SUM(q::HUGEINT * q)
                        - SUM(q)::HUGEINT * SUM(q)) * 1000000
                       <= {_X_CV2_PPM} * (SUM(q)::HUGEINT * SUM(q)) THEN 'X'
                  WHEN (COUNT(*) * SUM(q::HUGEINT * q)
                        - SUM(q)::HUGEINT * SUM(q)) * 1000000
                       <= {_Y_CV2_PPM} * (SUM(q)::HUGEINT * SUM(q)) THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM weekly GROUP BY pk
    )
    SELECT abc.abc, xyz.xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(abc.rev) AS BIGINT) AS revenue_cents,
           CAST(SUM(abc.rev) * 1000000 // tot.total AS BIGINT) AS share_ppm
    FROM abc JOIN xyz ON xyz.pk = abc.pk, tot
    GROUP BY abc.abc, xyz.xyz, tot.total
    """


@register("lineitem_abc_xyz", oracle=_AXYZ_ORACLE)
def lineitem_abc_xyz(spark, sf_dir):
    """The ABC×XYZ inventory matrix — the classic stocking-policy
    segmentation: revenue classes A/B/C (80/95% cumulative, via the
    catalog's two-phase bucket-prefix cumulative — no global sort)
    crossed with demand-variability classes X/Y/Z on the CV² of weekly
    shipped quantities (CV² ≤ 0.25 → X, ≤ 1.0 → Y, else Z; single-week
    parts are Z by convention).  CV² = (nΣq²−S²)/S² stays an exact
    cross-multiplied compare against the pinned ppm thresholds.  The
    9-cell census with revenue share answers "which cells deserve
    safety stock vs just-in-time".

    Scale shape: two partial-combined passes over lineitem (per-part
    revenue; per-part-week quantity) are the only fact-sized work; the
    ABC cumulative uses the bounded bucket-prefix pattern and the XYZ
    verdict is a per-part aggregate compare; the final matrix is ≤9
    rows.
    """
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    d0 = li.agg(F.min(F.col("l_shipdate").cast("date")).alias("d0"))
    base = li.crossJoin(F.broadcast(d0)).select(
        F.col("l_partkey").alias("pk"),
        F.expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").alias("cents"),
        F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("qty"),
        F.expr(
            "datediff(CAST(l_shipdate AS DATE), d0) div 7"
        ).alias("wk"),
    )
    pr = base.groupBy("pk").agg(F.sum("cents").cast("long").alias("rev"))
    tot = pr.agg(F.sum("rev").cast("long").alias("total"))
    b = pr.select("pk", "rev", F.expr(f"rev div {_AXYZ_BUCKET}").alias("bk"))
    bstats = b.groupBy("bk").agg(F.sum("rev").alias("brev"))
    above_w = Window.orderBy(F.col("bk").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    bpre = bstats.select(
        "bk", F.coalesce(F.sum("brev").over(above_w), F.lit(0)).alias("above")
    )
    in_bucket_w = (
        Window.partitionBy("bk")
        .orderBy(F.col("rev").desc(), F.col("pk"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    abc = (
        b.join(F.broadcast(bpre), "bk")
        .select(
            "pk",
            "rev",
            (F.col("above") + F.sum("rev").over(in_bucket_w)).alias("cum_rev"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "pk",
            "rev",
            F.when(F.col("cum_rev") * 100 <= 80 * F.col("total"), "A")
            .when(F.col("cum_rev") * 100 <= 95 * F.col("total"), "B")
            .otherwise("C")
            .alias("abc"),
        )
    )
    weekly = base.groupBy("pk", "wk").agg(F.sum("qty").alias("q"))
    dec = "CAST({} AS DECIMAL(38,0))"
    var_num = (
        f"(COUNT(*) * SUM({dec.format('q')} * q)"
        f" - {dec.format('SUM(q)')} * SUM(q))"
    )
    s2 = f"({dec.format('SUM(q)')} * SUM(q))"
    xyz = weekly.groupBy("pk").agg(
        F.expr(
            f"CASE WHEN COUNT(*) < 2 THEN 'Z'"
            f" WHEN {var_num} * 1000000 <= {_X_CV2_PPM} * {s2} THEN 'X'"
            f" WHEN {var_num} * 1000000 <= {_Y_CV2_PPM} * {s2} THEN 'Y'"
            " ELSE 'Z' END"
        ).alias("xyz")
    )
    return (
        abc.join(xyz, "pk")
        .groupBy("abc", "xyz")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("rev").cast("long").alias("revenue_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc",
            "xyz",
            "n_parts",
            "revenue_cents",
            F.expr("CAST(revenue_cents * 1000000 div total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Rich-club coefficients at degree-percentile thresholds
# --------------------------------------------------------------------------

_RC_PCTS = (75, 90)


_RC_ORACLE = f"""
    WITH li AS (
      SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), e AS (
      SELECT DISTINCT a.pk AS src, b.pk AS dst
      FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM e GROUP BY src
    ), ladder AS (
      SELECT d, COUNT(*) AS t,
             COALESCE(SUM(COUNT(*)) OVER (ORDER BY d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM deg GROUP BY d
    ), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    thr AS (
      SELECT u.p, l.d AS k
      FROM n, unnest([{", ".join(str(p) for p in _RC_PCTS)}]) AS u(p)
      JOIN ladder l ON l.below < ((u.p * (n.n - 1)) // 100) + 1
                   AND ((u.p * (n.n - 1)) // 100) + 1 <= l.below + l.t
    ), rich AS (
      SELECT thr.p, thr.k, deg.node
      FROM thr JOIN deg ON deg.d > thr.k
    ), club AS (
      SELECT p, k, CAST(COUNT(*) AS BIGINT) AS n_rich
      FROM rich GROUP BY p, k
    ), edges_within AS (
      SELECT ra.p, CAST(COUNT(*) AS BIGINT) AS m
      FROM e
      JOIN rich ra ON ra.node = e.src
      JOIN rich rb ON rb.node = e.dst AND rb.p = ra.p
      GROUP BY ra.p
    )
    SELECT club.p AS pct, CAST(club.k AS BIGINT) AS degree_threshold,
           club.n_rich,
           CAST(COALESCE(ew.m, 0) AS BIGINT) AS edges_within,
           CAST(CASE WHEN club.n_rich < 2 THEN 0
                ELSE COALESCE(ew.m, 0) * 1000000
                     // (club.n_rich * (club.n_rich - 1)) END AS BIGINT)
             AS phi_ppm
    FROM club LEFT JOIN edges_within ew ON ew.p = club.p
    """


@register("parts_rich_club", oracle=_RC_ORACLE)
def parts_rich_club(spark, sf_dir):
    """Rich-club coefficients (Colizza et al. 2006) of the co-purchase
    graph at the p{p1} and p{p2} degree thresholds (nearest-rank off
    the degree ladder — self-adapting to any SF): among the nodes whose
    degree EXCEEDS the threshold, φ = observed directed edges / possible
    directed pairs, in exact ppm.  φ → 1e6 says the hub parts form a
    near-clique (orders mix bestsellers together); read beside
    parts_assortativity, which asks the correlational version of the
    same question.

    Scale shape: degrees and the degree ladder are partial-combined
    aggregates (the ladder over the BOUNDED degree domain); the rich
    sets are degree-filtered node lists and the within-club edge count
    is two semi-join-shaped probes of the PERSISTED edge substrate —
    no new fact-sized work.
    """
    from kafka_sink_spark.plans.analytics_mining import _copurchase_edges

    e = _copurchase_edges(spark, sf_dir)
    deg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d"))
    below_w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
    ladder = (
        deg.groupBy("d")
        .agg(F.count("*").alias("t"))
        .select(
            "d",
            "t",
            F.coalesce(F.sum("t").over(below_w), F.lit(0)).alias("below"),
        )
    )
    n = deg.agg(F.count("*").cast("long").alias("n"))
    thr = (
        n.select(
            "n",
            F.explode(F.array(*[F.lit(p) for p in _RC_PCTS])).alias("p"),
        )
        .select("p", F.expr("((p * (n - 1)) div 100) + 1").alias("r"))
        .join(
            F.broadcast(ladder),
            (F.col("below") < F.col("r"))
            & (F.col("r") <= F.col("below") + F.col("t")),
        )
        .select("p", F.col("d").alias("k"))
    )
    rich = thr.join(deg, deg.d > thr.k).select("p", "k", "node")
    club = rich.groupBy("p", "k").agg(
        F.count("*").cast("long").alias("n_rich")
    )
    # rich sets are catalog-sized (scale with SF) — joins stay unhinted
    ew = (
        e.join(rich.select("p", F.col("node").alias("src")), "src")
        .join(rich.select("p", F.col("node").alias("dst")), ["p", "dst"])
        .groupBy("p")
        .agg(F.count("*").cast("long").alias("m"))
    )
    return (
        club.join(ew, "p", "left")
        .select(
            F.col("p").cast("long").alias("pct"),
            F.col("k").cast("long").alias("degree_threshold"),
            "n_rich",
            F.coalesce("m", F.lit(0)).cast("long").alias("edges_within"),
            F.expr(
                "CAST(CASE WHEN n_rich < 2 THEN 0"
                " ELSE COALESCE(m, 0) * 1000000 div (n_rich * (n_rich - 1))"
                " END AS BIGINT)"
            ).alias("phi_ppm"),
        )
    )


parts_rich_club.__doc__ = parts_rich_club.__doc__.format(
    p1=_RC_PCTS[0], p2=_RC_PCTS[1]
)
