"""Bench regression gate (tools/bench_gate.py): plan/runtime regressions
on the headline queries fail HERE before the driver bench records them.

The timing tests are opt-in (SPARK_GRAFT_BENCH_GATE=1) because they cost
~2 noop-sink passes over sf0.1; the gate LOGIC is always tested."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import bench_gate  # noqa: E402

_OPT_IN = os.environ.get("SPARK_GRAFT_BENCH_GATE") == "1"


def test_gate_logic_triggers_and_passes():
    """The bound check itself: a measured ratio past bound*slack is a
    violation (the shape an artificially de-broadcast join produces —
    5-20x on the affected query), within-slack drift is not, and a
    query with no recorded bound is flagged so bounds stay complete."""
    bounds = {"q_ok": 2.0, "q_bad": 1.0}
    measured = {"q_ok": 2.0 * bench_gate.SLACK * 0.9, "q_bad": 1.0 * bench_gate.SLACK * 5, "q_new": 1.0}
    bad = bench_gate.violations(measured, bounds)
    assert "q_ok" not in bad
    assert bad["q_bad"]["measured"] > bad["q_bad"]["limit"]
    assert bad["q_new"]["reason"] == "no recorded bound"


def test_bounds_file_covers_headline():
    """Every benched headline query must have a recorded bound, else the
    opt-in gate can't see a regression on it."""
    from bench import HEADLINE

    bounds = bench_gate.load_bounds()
    missing = [n for n in HEADLINE if n not in bounds]
    assert not missing, f"record bounds for {missing}: SPARK_GRAFT_BENCH_GATE=record python tools/bench_gate.py"


@pytest.mark.skipif(not _OPT_IN, reason="timing gate is opt-in: SPARK_GRAFT_BENCH_GATE=1")
def test_headline_within_recorded_bounds(spark):
    """Measure every headline query at sf0.1 (calibration-normalized,
    best-of-2) and assert none regressed past its recorded bound."""
    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 dataset not present")
    from bench import HEADLINE

    ratios = bench_gate.measure_ratios(spark, sf_dir, HEADLINE)
    bad = bench_gate.violations(ratios, bench_gate.load_bounds())
    assert not bad, f"bench regression: {bad}"


@pytest.mark.skipif(not _OPT_IN, reason="timing gate is opt-in: SPARK_GRAFT_BENCH_GATE=1")
def test_gate_catches_shuffle_missize_regression(spark):
    """Sensitivity check with a REAL plan regression — the class the
    gate exists for: AQE off + 2000 shuffle partitions + no
    auto-broadcast (a mis-sized-partitioning change; hint-broadcast
    dims are untouched, so this is a fair single-query regression).
    bars_5m_gapfill degrades ~5x measured on this host (its two-stage
    gap-fill shuffles twice) and must trip its recorded bound even
    though the same degradation also inflates the calibration
    denominator."""
    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 dataset not present")
    degrade = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": "2000",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in degrade}
    try:
        for k, v in degrade.items():
            spark.conf.set(k, v)
        ratios = bench_gate.measure_ratios(spark, sf_dir, ["bars_5m_gapfill"], passes=1)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    bad = bench_gate.violations(ratios, bench_gate.load_bounds())
    assert "bars_5m_gapfill" in bad, f"shuffle mis-size not caught: ratio {ratios}"
