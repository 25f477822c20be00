"""A/B the dedup shared-subtree persists against runtime ReusedExchange.

PERF.md r4 lesson: persist() on diamond-shaped plans LOST every measured
case (clustering coeff 2.5×, Jaccard 3×, RFM 3–7×) because runtime
ReusedExchange already computes the shared subtree once while cache
materialization serializes the first pass and breaks whole-stage fusion.
Four dedup persists predate that lesson; this harness measures them on
IDENTICAL code by flipping ``dedup.queries._PERSIST_SHARED``, interleaving
A/B/A/B... runs so ambient host load (PERF.md documents ~2× swings) hits
both arms equally, and reporting per-arm medians.

Usage: python tools/ab_persist.py [sf_dir] [reps=3]
"""

from __future__ import annotations

import json
import statistics
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from page_rank_mapreduce_java_spark.dedup import queries as dq

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("ab_persist")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # resolve registry names (some may carry family prefixes)
    names = []
    for q in QUERIES:
        match = [n for n in qs if n == q or n.endswith(q)]
        if not match:
            print(f"SKIP {q}: not in registry", file=sys.stderr)
            continue
        names.append(match[0])

    results: dict[str, dict[str, list[float]]] = {n: {"persist": [], "reuse": []} for n in names}
    # warm the JVM + file cache once per query with the current default
    for n in names:
        qs[n](spark, sf_dir).count()
        spark.catalog.clearCache()

    for rep in range(reps):
        for n in names:
            for arm, flag in (("persist", True), ("reuse", False)):
                dq._PERSIST_SHARED = flag
                t0 = time.monotonic()
                qs[n](spark, sf_dir).count()
                dt = time.monotonic() - t0
                spark.catalog.clearCache()
                results[n][arm].append(dt)
                print(f"rep{rep} {n} {arm}: {dt:.2f}s", file=sys.stderr)
    dq._PERSIST_SHARED = True

    out = {}
    for n in names:
        mp = statistics.median(results[n]["persist"])
        mr = statistics.median(results[n]["reuse"])
        out[n] = {
            "persist_median_s": round(mp, 3),
            "reuse_median_s": round(mr, 3),
            "winner": "persist" if mp < mr else "reuse",
            "ratio_persist_over_reuse": round(mp / mr, 3) if mr else None,
            "persist_runs": [round(x, 3) for x in results[n]["persist"]],
            "reuse_runs": [round(x, 3) for x in results[n]["reuse"]],
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
