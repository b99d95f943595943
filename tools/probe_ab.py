"""Same-session A/B probe harness for optimization work (guide §1).

Usage: python tools/probe_ab.py <query> [reps]

Times one headline query with the noop sink inside a single JVM:
one cold run, then ``reps`` warm runs (default 5), printing every
rep so alternating-series (ABAB) comparisons across two checkouts
can be read against host drift.  Analysis tooling only — never part
of the bench contract.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from muller_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench

    all_queries = dict(entrymod.queries())
    for n in bench.HEADLINE:
        if n not in all_queries and hasattr(entrymod, n):
            all_queries[n] = getattr(entrymod, n)
    fn = all_queries[name]

    spark = get_spark("muller_spark_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setJobDescription(f"probe: {name}")

    times = []
    for i in range(reps + 1):
        bench._isolate_between_queries(spark)
        t0 = time.perf_counter()
        bench.materialize(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"{name} rep{i}{' (cold)' if i == 0 else ''}: {dt:.3f}s",
              flush=True)
    warm = sorted(times[1:])
    print(f"{name} warm median: {warm[len(warm) // 2]:.3f}s")


if __name__ == "__main__":
    main()
