"""Round-7c wave: keyphrase extraction, privacy auditing, cluster-quality
evaluation, and revenue cohorting — four more published techniques in the
catalog's exact-integer, oracle-twinned style.

- ``docs_keyphrase_rake``  RAKE (Rose et al. 2010): candidate phrases are
  maximal runs of non-stopword tokens, each word scores degree/frequency,
  and a phrase scores the sum of its words' scores.  The stopword set is
  DATA-DERIVED (the corpus's top-20 tokens by frequency) so the operator
  is fully self-contained; word scores are truncated ppm so the phrase
  score is exact integers cross-engine.
- ``events_k_anonymity``  k-anonymity audit (Sweeney 2002): equivalence
  classes over a quasi-identifier tuple (user bucket, event type, hour),
  reported as a class-size-band histogram with row shares in ppm — the
  re-identification risk profile every training-data release needs.
- ``embedding_centroid_silhouette``  simplified (centroid-based)
  silhouette per label: a = squared distance to the own-label centroid,
  b = min over other labels; s = (b−a)/max(a,b) — computed on EXACT
  cross-multiplied integers ((n·x − S)² avoids the mean division) with
  squared distances throughout (no sqrt), truncated to ppm identically in
  both engines before the min/ratio so every comparison is deterministic.
- ``orders_cohort_revenue_retention``  revenue cohort curves: customers
  cohorted by first-order month, each cohort's revenue at month-age k as
  exact cents and as ppm of its month-0 revenue — the LTV/retention shape
  (the revenue companion to the user-count cohorts of
  events_retention_cohorts).

Determinism per the package convention: integer arithmetic end-to-end,
truncating division on non-negative operands, deterministic tiebreaks on
every rank/argmin.

Reference anchor: datastax/kafka-sink has no analytics surface (sink/src/main
is record mapping + DSE writes, see SURVEY.md §2); this module extends the
north-star inventory in COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_sink_spark.plans.queries import register
from kafka_sink_spark.session import load_tables

# --------------------------------------------------------------------------
# RAKE keyphrase extraction with corpus-derived stopwords
# --------------------------------------------------------------------------

_RAKE_STOP_K = 20  # stopword set: top-k corpus tokens by frequency
_RAKE_TOPK = 3  # keyphrases emitted per document

_RAKE_ORACLE = rf"""
    WITH arr AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, CAST(u.p AS BIGINT) AS p, t[u.p + 1] AS term
      FROM arr, unnest(range(len(t))) AS u(p)
    ), stops AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY COUNT(*) DESC, term) AS rk
        FROM toks GROUP BY term) WHERE rk <= {_RAKE_STOP_K}
    ), marked AS (
      SELECT t.doc_id, t.p, t.term,
             CASE WHEN s.term IS NULL THEN 0 ELSE 1 END AS is_stop
      FROM toks t LEFT JOIN stops s ON s.term = t.term
    ), grp AS (
      SELECT doc_id, p, term, is_stop,
             SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY p
               ROWS UNBOUNDED PRECEDING) AS g
      FROM marked
    ), members AS (
      SELECT doc_id, g, p, term FROM grp WHERE is_stop = 0
    ), phrases AS (
      SELECT doc_id, g, COUNT(*) AS plen,
             string_agg(term, ' ' ORDER BY p) AS phrase
      FROM members GROUP BY doc_id, g
    ), word_stats AS (
      SELECT m.term, COUNT(*) AS freq, SUM(ph.plen) AS degree
      FROM members m JOIN phrases ph ON ph.doc_id = m.doc_id AND ph.g = m.g
      GROUP BY m.term
    ), scored AS (
      -- one score PER OCCURRENCE (grouped by the run id g): a phrase text
      -- recurring in a doc must not sum its occurrences
      SELECT ph.doc_id, ph.g, ph.phrase, ph.plen,
             SUM(ws.degree * 1000000 // ws.freq) AS score_ppm
      FROM members m
      JOIN phrases ph ON ph.doc_id = m.doc_id AND ph.g = m.g
      JOIN word_stats ws ON ws.term = m.term
      GROUP BY ph.doc_id, ph.g, ph.phrase, ph.plen
    ), best AS (
      SELECT doc_id, phrase, plen, score_ppm,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score_ppm DESC, phrase) AS rk
      FROM (SELECT doc_id, phrase, MAX(plen) AS plen,
                   MAX(score_ppm) AS score_ppm
            FROM scored GROUP BY doc_id, phrase)
    )
    SELECT doc_id, CAST(rk AS INTEGER) AS rk, phrase,
           CAST(plen AS BIGINT) AS n_words,
           CAST(score_ppm AS BIGINT) AS score_ppm
    FROM best WHERE rk <= {_RAKE_TOPK}
    """


@register("docs_keyphrase_rake", oracle=_RAKE_ORACLE)
def docs_keyphrase_rake(spark, sf_dir):
    """RAKE keyphrase extraction (Rose et al. 2010): split each document
    at stopwords into candidate phrases, score each word w with
    degree(w)/freq(w) (degree = Σ phrase length over the phrases
    containing w — co-occurrence mass; freq = occurrence count), and each
    phrase with the sum of its words' scores; the top-{k} phrases per
    document are the keyphrases.  The stopword set is the corpus's own
    top-{s} tokens by frequency (no external list — self-contained and
    SF-stable); word scores are truncated-ppm integers so phrase sums are
    exact cross-engine.  Duplicate phrase texts within a doc dedupe to
    their best score before ranking.

    Scale shape: stopword extraction is a per-task top-{s}; phrase
    segmentation is ONE doc-keyed cumulative window (gaps-and-islands, the
    events_scd2_state shape); word stats partial-combine on the term key;
    the per-doc top-{k} plans as WindowGroupLimit.  Everything shuffles on
    doc or term keys — corpus-linear.
    """
    from kafka_sink_spark.extensions import text as text_ops

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(
        "doc_id", F.posexplode(text_ops.tokens(F.col("text"))).alias("p", "term")
    )
    stops = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .select(
            "term",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), F.col("term")))
            .alias("rk"),
        )
        .filter(F.col("rk") <= _RAKE_STOP_K)
        .select("term")
        .withColumn("_stop", F.lit(1))
    )
    marked = toks.join(F.broadcast(stops), "term", "left").select(
        "doc_id",
        "p",
        "term",
        F.coalesce("_stop", F.lit(0)).alias("is_stop"),
    )
    grp_w = Window.partitionBy("doc_id").orderBy("p").rowsBetween(
        Window.unboundedPreceding, 0
    )
    members = (
        marked.select(
            "doc_id", "p", "term", "is_stop", F.sum("is_stop").over(grp_w).alias("g")
        )
        .filter(F.col("is_stop") == 0)
        .select("doc_id", "g", "p", "term")
    )
    phrases = members.groupBy("doc_id", "g").agg(
        F.count("*").alias("plen"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "term"))),
                lambda s: s["term"],
            ),
        ).alias("phrase"),
    )
    word_stats = (
        members.join(phrases.select("doc_id", "g", "plen"), ["doc_id", "g"])
        .groupBy("term")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("degree"))
    )
    # one score PER OCCURRENCE (grouped by the run id g): a phrase text
    # recurring in a doc must not sum its occurrences
    scored = (
        members.join(phrases, ["doc_id", "g"])
        .join(word_stats.hint("shuffle_hash"), "term")
        .groupBy("doc_id", "g", "phrase", "plen")
        .agg(F.sum(F.expr("degree * 1000000 div freq")).alias("score_ppm"))
    )
    deduped = scored.groupBy("doc_id", "phrase").agg(
        F.max("plen").alias("plen"), F.max("score_ppm").alias("score_ppm")
    )
    best = deduped.select(
        "doc_id",
        "phrase",
        "plen",
        "score_ppm",
        F.row_number()
        .over(
            Window.partitionBy("doc_id").orderBy(
                F.col("score_ppm").desc(), F.col("phrase")
            )
        )
        .cast("int")
        .alias("rk"),
    ).filter(F.col("rk") <= _RAKE_TOPK)
    return best.select(
        "doc_id",
        "rk",
        "phrase",
        F.col("plen").cast("long").alias("n_words"),
        F.col("score_ppm").cast("long").alias("score_ppm"),
    )


docs_keyphrase_rake.__doc__ = docs_keyphrase_rake.__doc__.format(
    k=_RAKE_TOPK, s=_RAKE_STOP_K
)


# --------------------------------------------------------------------------
# k-anonymity audit over a quasi-identifier tuple
# --------------------------------------------------------------------------

_KANON_ORACLE = """
    WITH qi AS (
      SELECT user_id // 10 AS user_bucket, event_type,
             CAST(hour(ts) AS BIGINT) AS hod
      FROM events
    ), classes AS (
      SELECT user_bucket, event_type, hod, COUNT(*) AS sz
      FROM qi GROUP BY user_bucket, event_type, hod
    ), banded AS (
      SELECT CASE WHEN sz = 1 THEN '1'
                  WHEN sz BETWEEN 2 AND 4 THEN '2-4'
                  WHEN sz BETWEEN 5 AND 9 THEN '5-9'
                  ELSE '10+' END AS k_band,
             sz
      FROM classes
    ), tot AS (SELECT SUM(sz) AS n_rows FROM banded)
    SELECT k_band,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(sz) AS BIGINT) AS n_rows,
           CAST(SUM(sz) * 1000000 // tot.n_rows AS BIGINT) AS rows_ppm
    FROM banded, tot
    GROUP BY k_band, tot.n_rows
    """


@register("events_k_anonymity", oracle=_KANON_ORACLE)
def events_k_anonymity(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002) of the events table under the
    quasi-identifier (user bucket of 10, event type, hour of day):
    equivalence-class sizes banded into 1 / 2-4 / 5-9 / 10+, with the
    class count, row count and row share (ppm) per band.  Rows in the
    band k=1 are UNIQUE under the quasi-identifier — the re-identification
    risk surface — so this is the release-readiness report a training-data
    pipeline runs before publishing event-derived data.

    Scale shape: one partial-combined groupBy on the QI tuple (the only
    shuffle that touches raw rows), then a 4-row band rollup and a
    single-row broadcast total.  Skewed QI classes are exactly what AQE
    skew-split handles; no windows, no joins on the raw stream.
    """
    events = load_tables(spark, sf_dir, ("events",))["events"]
    classes = (
        events.select(
            F.expr("user_id div 10").alias("user_bucket"),
            "event_type",
            F.hour("ts").cast("long").alias("hod"),
        )
        .groupBy("user_bucket", "event_type", "hod")
        .agg(F.count("*").alias("sz"))
    )
    banded = classes.select(
        F.when(F.col("sz") == 1, "1")
        .when(F.col("sz").between(2, 4), "2-4")
        .when(F.col("sz").between(5, 9), "5-9")
        .otherwise("10+")
        .alias("k_band"),
        "sz",
    )
    tot = banded.agg(F.sum("sz").alias("n_rows_total"))
    return (
        banded.groupBy("k_band")
        .agg(
            F.count("*").cast("long").alias("n_classes"),
            F.sum("sz").cast("long").alias("n_rows"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k_band",
            "n_classes",
            "n_rows",
            F.expr("CAST(n_rows * 1000000 div n_rows_total AS BIGINT)").alias(
                "rows_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Simplified (centroid) silhouette per embedding label
# --------------------------------------------------------------------------

_SIL_ORACLE = """
    WITH comp AS (
      SELECT vec_id AS vid, label, i.i,
             CAST(round(embedding[i.i + 1]::DOUBLE * 1000000.0) AS BIGINT) AS xm
      FROM embeddings, (SELECT unnest(range(64)) AS i) i
    ), sums AS (
      SELECT label AS l, i, SUM(xm) AS s, COUNT(*) AS n_l
      FROM comp GROUP BY label, i
    ), d AS (
      SELECT c.vid, c.label, sums.l,
             SUM((sums.n_l * c.xm - sums.s)::HUGEINT
                 * (sums.n_l * c.xm - sums.s)) AS a2num,
             MAX(sums.n_l) AS n_l
      FROM comp c JOIN sums ON sums.i = c.i
      GROUP BY c.vid, c.label, sums.l
    ), q AS (
      SELECT vid, label, l,
             CAST(a2num // (n_l::HUGEINT * n_l) AS BIGINT) AS q_l
      FROM d
    ), own AS (
      SELECT vid, label, q_l AS q_a FROM q WHERE l = label
    ), other AS (
      SELECT vid, q_l AS q_b, l AS b_label,
             row_number() OVER (PARTITION BY vid ORDER BY q_l, l) AS rk
      FROM q WHERE l <> label
    ), s AS (
      SELECT own.vid, own.label, own.q_a, o.q_b, o.b_label,
             CASE WHEN GREATEST(own.q_a, o.q_b) = 0 THEN 0
                  WHEN o.q_b >= own.q_a
                  THEN (o.q_b - own.q_a) * 1000000 // GREATEST(own.q_a, o.q_b)
                  ELSE -((own.q_a - o.q_b) * 1000000 // GREATEST(own.q_a, o.q_b))
             END AS s_ppm
      FROM own JOIN other o ON o.vid = own.vid AND o.rk = 1
    )
    SELECT CAST(label AS INTEGER) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CASE WHEN SUM(s_ppm) >= 0 THEN SUM(s_ppm) // COUNT(*)
                     ELSE -((-SUM(s_ppm)) // COUNT(*)) END AS BIGINT)
             AS mean_s_ppm,
           CAST(MIN(s_ppm) AS BIGINT) AS min_s_ppm,
           CAST(SUM(CASE WHEN s_ppm < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_negative
    FROM s GROUP BY label
    """


@register("embedding_centroid_silhouette", oracle=_SIL_ORACLE)
def embedding_centroid_silhouette(spark, sf_dir):
    """Simplified silhouette (centroid-based, Hruschka et al.) of the
    labeled embeddings: per vector, a = squared distance to its own
    label's centroid, b = the minimum over other labels; s = (b−a)/max(a,b)
    ∈ [−1, 1].  Everything is exact integers: the centroid mean division
    is cleared by (n_l·x − S_l)² cross-multiplication, squared distances
    replace sqrt throughout, and per-label distances are truncated to the
    SAME micro²-unit integers in both engines before the argmin — so the
    nearest-other label and the sign of every s are deterministic.
    Emitted per label: vector count, mean/min silhouette (ppm, sign-split
    truncation), and the misassignment count (s < 0 ⇔ some other centroid
    is closer) — the clustering-quality readout for the label structure
    the kNN/centroid classifiers in the catalog consume.

    Scale shape: label×dim sums are a partial-combined aggregate
    (|labels|·64 rows, broadcast back); the per-(vector, label) distance
    is one corpus-linear join on the dimension key with partial-combined
    sums; the per-vector argmin is a |labels|-row WindowGroupLimit.
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    comp = emb.select(
        F.col("vec_id").alias("vid"),
        "label",
        F.posexplode("embedding").alias("i", "x"),
    ).select(
        "vid",
        "label",
        "i",
        F.round(F.col("x").cast("double") * 1_000_000.0).cast("bigint").alias("xm"),
    )
    sums = comp.groupBy(F.col("label").alias("l"), "i").agg(
        F.sum("xm").alias("s"), F.count("*").alias("n_l")
    )
    d = (
        comp.join(F.broadcast(sums), "i")
        .groupBy("vid", "label", "l")
        .agg(
            F.sum(
                F.expr(
                    "CAST(n_l * xm - s AS DECIMAL(38,0)) * (n_l * xm - s)"
                )
            ).alias("a2num"),
            F.max("n_l").alias("n_l"),
        )
    )
    q = d.select(
        "vid",
        "label",
        "l",
        F.expr(
            "CAST(a2num div (CAST(n_l AS DECIMAL(38,0)) * n_l) AS BIGINT)"
        ).alias("q_l"),
    )
    own = q.filter(F.col("l") == F.col("label")).select(
        "vid", "label", F.col("q_l").alias("q_a")
    )
    other = (
        q.filter(F.col("l") != F.col("label"))
        .select(
            "vid",
            F.col("q_l").alias("q_b"),
            F.col("l").alias("b_label"),
            F.row_number()
            .over(Window.partitionBy("vid").orderBy("q_l", "l"))
            .alias("rk"),
        )
        .filter(F.col("rk") == 1)
    )
    s = own.join(other, "vid").select(
        "vid",
        "label",
        F.expr(
            "CASE WHEN GREATEST(q_a, q_b) = 0 THEN 0"
            " WHEN q_b >= q_a"
            " THEN (q_b - q_a) * 1000000 div GREATEST(q_a, q_b)"
            " ELSE -((q_a - q_b) * 1000000 div GREATEST(q_a, q_b)) END"
        ).alias("s_ppm"),
    )
    return s.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.expr(
            "CAST(CASE WHEN SUM(s_ppm) >= 0 THEN SUM(s_ppm) div COUNT(*)"
            " ELSE -((-SUM(s_ppm)) div COUNT(*)) END AS BIGINT)"
        ).alias("mean_s_ppm"),
        F.min("s_ppm").cast("long").alias("min_s_ppm"),
        F.sum(F.when(F.col("s_ppm") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
    )


# --------------------------------------------------------------------------
# Revenue cohort retention curves
# --------------------------------------------------------------------------

_COHORT_ORACLE = """
    WITH o AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), cohorts AS (
      SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY o_custkey
    ), cells AS (
      SELECT c.cohort_m, o.m - c.cohort_m AS age,
             COUNT(DISTINCT o.o_custkey) AS n_customers,
             SUM(o.cents) AS revenue_cents
      FROM o JOIN cohorts c ON c.o_custkey = o.o_custkey
      GROUP BY c.cohort_m, o.m - c.cohort_m
    ), base AS (
      SELECT cohort_m, revenue_cents AS base_cents FROM cells WHERE age = 0
    )
    SELECT cells.cohort_m, cells.age,
           CAST(cells.n_customers AS BIGINT) AS n_customers,
           CAST(cells.revenue_cents AS BIGINT) AS revenue_cents,
           CAST(cells.revenue_cents * 1000000 // base.base_cents AS BIGINT)
             AS retention_ppm
    FROM cells JOIN base ON base.cohort_m = cells.cohort_m
    """


@register("orders_cohort_revenue_retention", oracle=_COHORT_ORACLE)
def orders_cohort_revenue_retention(spark, sf_dir):
    """Revenue cohort curves: customers are cohorted by their first-order
    month, and each (cohort, month-age) cell reports active customers,
    exact revenue cents, and revenue as ppm of the cohort's month-0
    revenue — the LTV/retention readout marketing and growth teams run on
    every transactional dataset, here as the REVENUE companion to the
    user-count cohorts of events_retention_cohorts.  Month arithmetic is
    pure integers (year·12 + month), so no date interval semantics can
    diverge cross-engine.

    Scale shape: first-order months are one partial-combined min per
    customer; the cohort join shuffles on the customer key both sides
    already aggregate on; cells partial-combine on (cohort, age) — tiny
    keyspace; the month-0 base joins back broadcast.
    """
    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    o = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("m"),
        F.expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cohorts = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    cells = (
        o.join(cohorts, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("age"))
        .agg(
            F.count_distinct("o_custkey").cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )
    base = cells.filter(F.col("age") == 0).select(
        "cohort_m", F.col("revenue_cents").alias("base_cents")
    )
    return cells.join(F.broadcast(base), "cohort_m").select(
        "cohort_m",
        "age",
        "n_customers",
        "revenue_cents",
        F.expr("CAST(revenue_cents * 1000000 div base_cents AS BIGINT)").alias(
            "retention_ppm"
        ),
    )
