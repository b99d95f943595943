"""Job-count + wall-time probe for one headline query (guide §1).

Usage: python tools/probe_jobs.py <query> [reps]

Times the query with the noop sink inside one JVM and reports, per
rep, the number of Spark JOBS scheduled (via a status-tracker delta)
— the scheduling-latency diagnostic for warm lookup paths
(VERDICT r12 #4: q_typo_match is job-count-bound).  Analysis tooling
only — never part of the bench contract.
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
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench

    all_queries = dict(entrymod.queries())
    for n in bench.HEADLINE:
        if n not in all_queries and hasattr(entrymod, n):
            all_queries[n] = getattr(entrymod, n)
    fn = all_queries[name]

    spark = get_spark("muller_spark_probe_jobs")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    def n_jobs() -> int:
        # the DAGScheduler's job counter
        return int(jsc.dagScheduler().numTotalJobs())

    for i in range(reps + 1):
        bench._isolate_between_queries(spark)
        j0 = n_jobs()
        t0 = time.perf_counter()
        sc.setJobDescription(f"probe_jobs: {name} rep{i}")
        bench.materialize(fn(spark, sf_dir))
        dt = time.perf_counter() - t0
        j1 = n_jobs()
        print(
            f"{name} rep{i}{' (cold)' if i == 0 else ''}: "
            f"{dt:.3f}s  jobs={j1 - j0}",
            flush=True,
        )


if __name__ == "__main__":
    main()
