"""Behavior invariants for the round-13 composed web-curation funnel
(plans/analytics_webpipe.py): the stage ladder must chain exactly, the
per-source report must reconcile with the ladder totals, and the per-doc
first-fail attribution must be a partition (every doc lands in exactly
one bucket)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_webpipe import _web_spine


def _ladder(spark, sf_dir):
    rows = (
        QUERIES["pipeline_web_stage_ladder"](spark, sf_dir)
        .orderBy("stage_ord")
        .collect()
    )
    assert [r["stage"] for r in rows] == [
        "url_dedup",
        "line_dedup",
        "classifier",
        "perplexity",
        "decontamination",
        "span_excision",
    ]
    return rows


def test_ladder_chains_exactly(spark, sf_dir):
    rows = _ladder(spark, sf_dir)
    for r in rows:
        assert r["docs_out"] == r["docs_in"] - r["docs_dropped"], r
        assert r["docs_dropped"] >= 0 and r["docs_out"] >= 0, r
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["docs_in"] == prev["docs_out"], (prev, nxt)
    # the token-char ledger never grows down the funnel
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["token_chars_out"] <= prev["token_chars_out"], (prev, nxt)
    # content stages drop no docs
    by = {r["stage"]: r for r in rows}
    assert by["line_dedup"]["docs_dropped"] == 0
    assert by["span_excision"]["docs_dropped"] == 0
    # line dedup's cut is published in its own unit and leaves the token
    # ledger unchanged BY DESIGN (module docstring)
    assert (
        by["line_dedup"]["token_chars_out"]
        == by["url_dedup"]["token_chars_out"]
    )


def test_report_reconciles_with_ladder(spark, sf_dir):
    rows = _ladder(spark, sf_dir)
    by = {r["stage"]: r for r in rows}
    rep = QUERIES["pipeline_web_curation_report"](spark, sf_dir).agg(
        F.sum("n_docs").alias("n"),
        F.sum("url_dropped").alias("d_url"),
        F.sum("cls_dropped").alias("d_cls"),
        F.sum("ppl_dropped").alias("d_ppl"),
        F.sum("decon_dropped").alias("d_dec"),
        F.sum("surviving_docs").alias("sv"),
        F.sum("span_removed_chars").alias("sr"),
        F.sum("token_chars_final").alias("final"),
    ).collect()[0]
    assert rep["n"] == by["url_dedup"]["docs_in"]
    assert rep["d_url"] == by["url_dedup"]["docs_dropped"]
    assert rep["d_cls"] == by["classifier"]["docs_dropped"]
    assert rep["d_ppl"] == by["perplexity"]["docs_dropped"]
    assert rep["d_dec"] == by["decontamination"]["docs_dropped"]
    assert rep["sv"] == by["span_excision"]["docs_out"]
    assert rep["sr"] == by["span_excision"]["chars_removed"]
    assert rep["final"] == by["span_excision"]["token_chars_out"]


def test_report_internal_ledger(spark, sf_dir):
    for r in QUERIES["pipeline_web_curation_report"](spark, sf_dir).collect():
        assert r["surviving_docs"] == r["n_docs"] - (
            r["url_dropped"]
            + r["cls_dropped"]
            + r["ppl_dropped"]
            + r["decon_dropped"]
        ), r
        # the final token chars are exactly the survivors' chars minus the
        # span cut (both measured in token chars)
        assert (
            r["token_chars_final"]
            == r["token_chars_surviving"] - r["span_removed_chars"]
        ), r
        assert r["token_chars_surviving"] <= r["token_chars_total"], r


def test_attribution_is_a_partition(spark, sf_dir):
    """Every doc lands in exactly one first-fail bucket (or survives)."""
    bad = (
        _web_spine(spark, sf_dir)
        .where(
            F.col("a_url")
            + F.col("a_cls")
            + F.col("a_ppl")
            + F.col("a_dec")
            + F.col("sv")
            != 1
        )
        .count()
    )
    assert bad == 0
