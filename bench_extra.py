"""Section-instrumented wrapper around the FROZEN bench.py (guide §1:
measure first).  Runs the exact phases of bench.main() via bench's own
functions and prints a wall-clock per phase, so optimization targets the
real driver budget — the driver's outer timeout killed the round-7 run
(BENCH_r07.json rc=124) and bench.py itself is frozen for measurement.

Usage: python bench_extra.py            # full phase-timed run
       python bench_extra.py --sections census,skew   # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench  # noqa: E402


def main() -> None:
    from libosmtools_spark.data.synth import ensure_fixtures

    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--sections":
        only = set(sys.argv[2].split(","))

    phases: dict[str, float] = {}
    t_all = time.monotonic()

    def mark(name: str, t0: float) -> None:
        phases[name] = round(time.monotonic() - t0, 1)
        print(f"[phase] {name}: {phases[name]}s", flush=True)

    def want(name: str) -> bool:
        return only is None or name in only

    t0 = time.monotonic()
    fixtures = ensure_fixtures(bench.SF if bench.SF in ("0.001", "0.01", "0.1") else "0.01")
    mark("fixtures", t0)

    t0 = time.monotonic()
    spark = bench.make_spark(bench.CPUS)
    mark("spark_start", t0)

    walls: dict[str, float] = {}
    if want("warmup"):
        t0 = time.monotonic()
        bench.flagship_count(spark, ensure_fixtures("0.001"))
        mark("warmup_sf0.001", t0)

    if want("flagship"):
        t0 = time.monotonic()
        flagship = bench.Timed()
        n_pages = 0
        for _ in range(3):
            n_pages = flagship.run(lambda: bench.flagship_count(spark, fixtures))
            bench.calibrate()
        mark("flagship_min3", t0)
        print(f"  flagship best wall: {flagship.wall:.3f}s  n_pages={n_pages}", flush=True)

    if want("census"):
        t0 = time.monotonic()
        walls, qcpu, qfloors = bench.bench_queries(spark, bench.SF_DIR)
        mark("census_3pass", t0)
        print("  census best walls:", json.dumps(walls), flush=True)
        print("  census floors:", qfloors, flush=True)

    if want("skew"):
        t0 = time.monotonic()
        skew = bench.skew_probe(spark, fixtures)
        mark("skew_probe", t0)
        print("  skew:", json.dumps(skew), flush=True)

    spark.stop()

    if want("x10"):
        t0 = time.monotonic()
        x10 = bench.x10_section(fixtures, walls or {})
        mark("x10_section", t0)
        print("  x10:", json.dumps(x10), flush=True)

    if want("scaling"):
        t0 = time.monotonic()
        sc = bench.scaling_section(fixtures)
        mark("scaling_section", t0)
        print("  scaling gate:", sc.get("scaling_gate_met"),
              "median:", sc.get("scaling_efficiency_median"),
              "cpu_inflation:", sc.get("scaling_cpu_inflation"),
              "pairs:", sc.get("scaling_runs_per_config"), flush=True)
        print("  scaling lo runs:", sc["scaling"][str(int(os.environ.get("SPARK_GRAFT_SCALE_N", "4")))]["all_runs_sec"], flush=True)
        print("  scaling hi runs:", sc["scaling"][str(4 * int(os.environ.get("SPARK_GRAFT_SCALE_N", "4")))]["all_runs_sec"], flush=True)

    phases["TOTAL"] = round(time.monotonic() - t_all, 1)
    print("[phases]", json.dumps(phases), flush=True)


if __name__ == "__main__":
    main()
