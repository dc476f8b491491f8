"""Capture .explain("formatted") output for headline (or named) queries.

Usage: python tools/capture_plans.py <out_dir> <tag> [query ...]

Writes <out_dir>/<query>_<tag>.txt for each query (registry rows and
bench-extra callables), plus a one-line-per-query summary of plan shape
(Exchange count, join strategies, Python-boundary nodes) to stdout —
the measurement bookkeeping the optimization guide §1 asks for.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vector_database_watermarking_spark.registry import QUERIES
from vector_database_watermarking_spark.session import get_spark


def explain_str(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def plan_shape(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    joins = sorted(
        set(
            re.findall(
                r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                r"BroadcastNestedLoopJoin|CartesianProduct)\b",
                plan,
            )
        )
    )
    py = sorted(
        set(
            re.findall(
                r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|"
                r"FlatMapGroupsInPandas)\b",
                plan,
            )
        )
    )
    return f"exchanges={n_ex} joins={joins} python={py}"


def main() -> int:
    out_dir = sys.argv[1]
    tag = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")

    import bench

    fns = {n: QUERIES[n].fn for n in bench.HEADLINE if n in QUERIES}
    fns.update(bench.BENCH_EXTRA)
    if names:
        for n in names:
            if n not in fns and n in QUERIES:
                fns[n] = QUERIES[n].fn
        fns = {n: fns[n] for n in names}
    for name, fn in fns.items():
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            plan = explain_str(df)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"OK   {name}: {plan_shape(plan)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
