"""Round-12 optimization profiler: bench-methodology walls + formatted
plans for a set of queries, in one session.

For each named query: warm once at sf0.001 (codegen/JIT) and once at the
target sf_dir (one-time builds: memoized bounds, BFS levels, page cache),
then time ``reps`` noop-sink materializations (guide §1.4) with the cache
cleared between reps, and optionally write the formatted plan to
``plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt`` (default r13; guide §7.2).

Usage:
    python tools/profile_queries.py [--sf DIR] [--reps N] [--plans TAG] q1 q2 ...

Walls print per rep plus median; plan files land under plans/<round>/.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="write plans/<round>/<q>_<TAG>.txt")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from page_rank_mapreduce_java_spark import get_spark
    from page_rank_mapreduce_java_spark.plans.explain import formatted_plan

    spark = get_spark(app_name="profile_queries")
    qs = entrymod.queries()
    unknown = [n for n in args.queries if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 1

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    warm_dir = "/root/testdata/sf0.001"
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        if not args.no_warm:
            for d in (warm_dir, args.sf):
                try:
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                except Exception as e:  # noqa: BLE001
                    print(f"{name}: warmup at {d} failed: {e}")
                spark.catalog.clearCache()
        walls = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            spark.catalog.clearCache()
        med = statistics.median(walls)
        print(f"{name}: median={med:.3f}s reps={walls}", flush=True)
        if args.plans:
            plan = formatted_plan(fn(spark, args.sf))
            path = os.path.join(plans_dir, f"{name}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(plan)
            spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
