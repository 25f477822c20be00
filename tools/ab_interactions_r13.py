"""Interleaved A/B for the r13 rec `_interactions` subset-key
(VERDICT r12 next #4 — the r12 attempt drowned in ambient noise).

Arms share ONE session and interleave rep by rep (ambient load hits
both): A = r12 shape (groupBy exchange on (user_id, item_id)),
B = r13 shape (repartition("user_id") before the groupBy; the self-join
and pair-bound aggregate reuse the exchange). Consumer measured is
rec_item_item_topk's full body via operators.recommend.item_item_topk —
the real query path. Usage: python tools/ab_interactions_r13.py [reps].
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5

    import bench
    from pyspark.sql import functions as F

    from page_rank_mapreduce_java_spark import get_spark
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.recommend import (
        item_item_topk,
    )

    spark = get_spark(app_name="ab_interactions_r13")

    def inter(sf_dir: str, keyed: bool):
        o = load_table(spark, "orders", sf_dir).select(
            F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("user_id")
        )
        l = load_table(spark, "lineitem", sf_dir).select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item_id")
        )
        j = l.join(o, "ok")
        if keyed:
            j = j.repartition("user_id")
        return j.groupBy("user_id", "item_id").agg(
            F.count(F.lit(1)).alias("c")
        )

    def run(keyed: bool, sf_dir: str = SF_DIR) -> float:
        t0 = time.monotonic()
        item_item_topk(
            inter(sf_dir, keyed), bound_key=f"ab13:{keyed}:{sf_dir}"
        ).write.format("noop").mode("overwrite").save()
        wall = time.monotonic() - t0
        spark.catalog.clearCache()
        return round(wall, 3)

    # result-identity check first (cheap, sf0.01)
    small = "/root/testdata/sf0.01"
    a_rows = sorted(
        map(tuple, item_item_topk(inter(small, False), bound_key="abi:a").collect())
    )
    b_rows = sorted(
        map(tuple, item_item_topk(inter(small, True), bound_key="abi:b").collect())
    )
    assert a_rows == b_rows, "subset-key changed results!"
    print(f"identity ok: {len(a_rows)} rows identical at sf0.01", flush=True)
    spark.catalog.clearCache()

    # warm both arms (codegen + one-time builds)
    for keyed in (False, True):
        run(keyed, "/root/testdata/sf0.001")
        run(keyed)

    walls = {False: [], True: []}
    tele = []
    for r in range(reps):
        for keyed in (False, True):
            bw = bench._bandwidth_probe()
            c0 = bench._cpu_counters()
            w = run(keyed)
            st = bench._steal_pct(c0, bench._cpu_counters())
            walls[keyed].append(w)
            tele.append((r, keyed, w, st, bw))
            print(f"rep {r} keyed={keyed}: {w}s steal={st}% bw={bw}s", flush=True)
    for keyed in (False, True):
        xs = walls[keyed]
        quiet = [
            w
            for (_, k, w, st, bw) in tele
            if k == keyed and (st is None or st <= 2.0) and bw <= 0.12
        ]
        print(
            f"ARM keyed={keyed}: median={statistics.median(xs):.3f} "
            f"all={xs} quiet_median="
            f"{statistics.median(quiet) if quiet else float('nan'):.3f} "
            f"({len(quiet)} quiet reps)",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
