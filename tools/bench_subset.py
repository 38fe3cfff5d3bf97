"""Targeted scale-point benchmark: run a NAMED SUBSET of the bench
queries at a given sf_dir and print the same one-line JSON shape as
bench.py.  Used for the large scale points (e.g. .scratch/sf10.0) where
sweeping all 31 headline queries would mostly re-measure fixed costs —
the subset is the operators whose scaling behavior is under test, plus
a couple of linear baselines to normalize against.

Usage:
    python tools/bench_subset.py <sf_dir> <query> [<query> ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PREPARE, RESOLVE  # noqa: E402
from img2dataset_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in RESOLVE]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark(app_name="bench_subset")
    # same warm-up as bench.py: JVM codegen + Python worker pool
    spark.range(1000).selectExpr("sum(id)").collect()
    (
        spark.range(64)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)))
        .mapInPandas(lambda it: it, "id long")
        .count()
    )
    load_start = os.getloadavg()
    times: dict[str, float] = {}
    spread: dict[str, float] = {}

    def run_once(name: str) -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        RESOLVE[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 3)

    for name in names:
        if name in PREPARE:
            PREPARE[name](spark, sf_dir)  # untimed one-off indexing job
        # same adaptive depth as bench.py: sample until the two fastest
        # agree within 30% (cap 4) so one contended run can't masquerade
        # as a scaling regression
        runs = [run_once(name), run_once(name)]
        while len(runs) < 4 and sorted(runs)[1] > 1.3 * sorted(runs)[0]:
            runs.append(run_once(name))
        times[name] = min(runs)
        spread[name] = round(sorted(runs)[1] / sorted(runs)[0], 3)
        print(f"  {name}: {times[name]}s (runs {runs})", file=sys.stderr, flush=True)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "subset_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
                "timing": "adaptive_min_of_2_to_4_runs",
                "spread": spread,
            }
        )
    )


if __name__ == "__main__":
    main()
