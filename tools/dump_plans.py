"""Dump .explain("formatted") for headline queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [query ...]
  tag    subdirectory under plans/ (e.g. r12_before)
  query  optional subset; default = the bench HEADLINE list

Each query's plan goes to plans/<tag>/<query>.txt.  This is analysis
tooling only — it never times anything and never touches the bench
contract.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from muller_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12_before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    all_queries = dict(entrymod.queries())
    for n in bench.HEADLINE:
        if n not in all_queries and hasattr(entrymod, n):
            all_queries[n] = getattr(entrymod, n)
    if not names:
        names = [n for n in bench.HEADLINE if n in all_queries]

    spark = get_spark("muller_spark_plandump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = all_queries.get(name)
        if fn is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # plan must never abort the sweep
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}", file=sys.stderr)


if __name__ == "__main__":
    main()
