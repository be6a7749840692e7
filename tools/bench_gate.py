"""Bench regression gate: catch plan/runtime regressions BEFORE the
driver bench does.

Raw wall-clock bounds are useless on this host (2-4x run-to-run
variance under contention — see bench.py's variance guard), so the gate
normalizes by a fixed in-session CALIBRATION workload: each headline
query's cost is recorded as `query_time / calibration_time`, a ratio
that is stable because a contention burst slows numerator and
denominator together. `tools/bench_bounds.json` holds the recorded
ratios; the gate fails when a measured ratio exceeds bound * slack.

Regenerate bounds after an intentional plan change:

    SPARK_GRAFT_BENCH_GATE=record python tools/bench_gate.py
"""

from __future__ import annotations

import json
import os
import time

BOUNDS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_bounds.json")

#: gate slack: measured ratio may drift up to this factor above the
#: recorded ratio before the gate fails. Wide enough for residual noise
#: the calibration doesn't cancel (JIT state, GC), narrow enough that a
#: de-broadcast join (5-20x on the affected query) still trips it.
SLACK = 3.0


def calibration_time(spark) -> float:
    """Fixed workload timed in-session: one codegen'd scan + hash
    aggregate over a generated range — no data dependence, touches the
    same executor pool and whole-stage-codegen path as the queries."""
    t0 = time.perf_counter()
    spark.range(20_000_000).selectExpr(
        "id % 97 AS k", "id * 2654435761 % 1000003 AS v"
    ).groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def measure_ratios(spark, sf_dir: str, names: list[str], passes: int = 2) -> dict[str, float]:
    """Best-of-N noop-sink times for each query, divided by the in-run
    calibration time (itself best-of-N, interleaved the same way)."""
    from financedatabase_spark.plans.registry import QUERIES

    cal = float("inf")
    times = {n: float("inf") for n in names}
    # warm pass (JIT, parquet footers) at the measurement SF
    for n in names:
        QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for _ in range(passes):
        cal = min(cal, calibration_time(spark))
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[n] = min(times[n], time.perf_counter() - t0)
    return {n: round(t / cal, 3) for n, t in times.items()}


def load_bounds(path: str = BOUNDS_PATH) -> dict[str, float]:
    with open(path) as f:
        return json.load(f)["ratios"]


def violations(measured: dict[str, float], bounds: dict[str, float], slack: float = SLACK) -> dict:
    """Queries whose measured calibration-ratio exceeds bound * slack
    (plus any measured query with no recorded bound — record one)."""
    out = {}
    for name, ratio in measured.items():
        bound = bounds.get(name)
        if bound is None:
            out[name] = {"measured": ratio, "bound": None, "reason": "no recorded bound"}
        elif ratio > bound * slack:
            out[name] = {"measured": ratio, "bound": bound, "limit": round(bound * slack, 3)}
    return out


def main() -> None:
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    from financedatabase_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-gate")
    ratios = measure_ratios(spark, sf_dir, HEADLINE)
    if os.environ.get("SPARK_GRAFT_BENCH_GATE") == "record":
        with open(BOUNDS_PATH, "w") as f:
            json.dump({"sf_dir": sf_dir, "slack": SLACK, "ratios": ratios}, f, indent=1)
        print(f"recorded {len(ratios)} bounds -> {BOUNDS_PATH}")
    else:
        bad = violations(ratios, load_bounds())
        print(json.dumps({"ratios": ratios, "violations": bad}))
        if bad:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
