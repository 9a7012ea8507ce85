"""Behavior invariants for the round-10b decomposition/tuning wave
(plans/analytics_decomp.py).  Cross-engine equality is covered by
test_entry_oracle / tools/driver_check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_sink_spark.plans import QUERIES
from kafka_sink_spark.plans.analytics_decomp import (
    _NPROBE_GRID,
    _SWEEP_K,
    _SWEEP_QUERIES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_theil_decomposition_identity(spark):
    rows = {
        r["component"]: r
        for r in QUERIES["lineitem_theil_decomposition"](spark, SF_DIR).collect()
    }
    total = rows.pop("*total*")
    between = rows.pop("*between*")
    # the decomposition identity T_total = T_between + sum_g w_g * T_g:
    # exact in real arithmetic; under the octave-log2 approximation each
    # log carries <= 0.0861 bits of position-dependent bias and the
    # composed/direct paths pair their ratio arguments differently, so
    # the residual is bounded by ~2 x 0.0861 bits plus truncation
    composed = between["theil_ppm_bits"] + sum(
        r["weight_ppm"] * r["theil_ppm_bits"] // 1_000_000 for r in rows.values()
    )
    bound = 172_100 + total["n_cells"] + 2 * len(rows)
    assert abs(total["theil_ppm_bits"] - composed) <= bound, (
        total["theil_ppm_bits"],
        composed,
    )
    # inequality indices stay nonnegative-ish under the ratio convention
    # (octave biases cancel near uniformity; truncation can dip a few ppm)
    assert total["theil_ppm_bits"] > -1_000
    assert between["theil_ppm_bits"] > -1_000
    # group weights sum to ~1e6 (truncating division loses < |groups| ppm)
    wsum = sum(r["weight_ppm"] for r in rows.values())
    assert 1_000_000 - len(rows) <= wsum <= 1_000_000
    # totals are consistent
    assert total["total_cents"] == between["total_cents"]
    assert sum(r["total_cents"] for r in rows.values()) == total["total_cents"]
    assert sum(r["n_cells"] for r in rows.values()) == total["n_cells"]


def test_nprobe_sweep_monotone(spark):
    rows = {
        r["nprobe"]: r
        for r in QUERIES["knn_ivf_nprobe_sweep"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(_NPROBE_GRID)
    # cost and recall are monotone nondecreasing in nprobe: probing more
    # cells can only widen every query's candidate set
    for lo, hi in zip(_NPROBE_GRID, _NPROBE_GRID[1:]):
        assert rows[lo]["n_candidates"] <= rows[hi]["n_candidates"]
        assert rows[lo]["hits"] <= rows[hi]["hits"]
    for r in rows.values():
        assert r["n_queries"] == _SWEEP_QUERIES
        assert 0 <= r["hits"] <= _SWEEP_QUERIES * _SWEEP_K
        assert r["recall_ppm"] == r["hits"] * 1_000_000 // (_SWEEP_QUERIES * _SWEEP_K)
    # probing half the cells (4 of 8) should recover a solid majority of
    # the exact top-k on this corpus
    assert rows[max(_NPROBE_GRID)]["recall_ppm"] >= 500_000


def test_decomp_single_fact_scan(spark):
    # the (nation, part) rollup is checkpointed: the lineitem join runs
    # once, every grid consumer reads the checkpointed RDD
    plan = (
        QUERIES["lineitem_theil_decomposition"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 0
    assert "Scan ExistingRDD" in plan
