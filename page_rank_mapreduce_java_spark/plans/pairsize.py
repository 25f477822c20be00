"""Volume-sized pair-exchange partitioning — the shared chassis for
every Σ-bound pair stream in the engine.

The problem class (found by the round-7 sf10 smoke, PERF.md §r7-2): a
same-key self-join emits Σ group_size² candidate-pair rows, and the
exchange feeding the pair aggregation runs at the SESSION's
shuffle.partitions. Parallelism is fixed while pair volume grows with
the corpus, so each task's sort state is (Σ g²)/parts rows — at 100×
data on one 8g JVM the spill reader's read-ahead buffers blew the heap
(`UnsafeSorterSpillReader` OOM at 32 partitions over a ~2B-row pair
stream). The blanket-AQE alternative (initialPartitionNum = 8×cores)
was measured and REJECTED: it fixes the pair exchange but taxes every
small/iterative shuffle (+49–62% on dedup_clusters / text_unigram_nll;
see session.py comment).

The adopted fix, lifted here from operators/recommend.py (round 7) so
every Σ-bound pair site shares it: compute the pair bound with ONE
cheap aggregate over the group-key relation, then explicitly
hash-repartition the pair stream on the pair key to

    clamp(bound / 1e6 rows, [shuffle.partitions, 4096])

partitions. Hash partitioning on exactly the grouping key satisfies
the downstream aggregate's distribution, so Catalyst ELIDES the
groupBy's own exchange — the plan keeps ONE pair-key exchange
(REPARTITION_BY_NUM in the formatted plan), now memory-sized instead
of core-sized. Small corpora keep the session-parallelism plan
bit-for-bit (the clamp floor); more partitions than cores just queue,
so the sizing is memory-bound, not core-bound.

The bound aggregate is a driver-side action at plan-construction time.
To keep repeated plan builds (explain sweeps, plan-shape tests, the
registry preflight) from re-paying it, bounds are memoized per
(application, cache_key) when the caller supplies a stable key —
ADVICE r7 flagged the un-memoized eager action in item_item_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAIR_ROWS_PER_PARTITION = 1_000_000
PAIR_MAX_PARTITIONS = 4096

# (applicationId, cache_key) -> bound rows. Keyed by app id so a new
# session (new data, new conf) never reads a stale bound.
_BOUND_CACHE: dict[tuple[str, str], int] = {}


def sum_sq_group_bound(
    df: DataFrame,
    key_cols: list[str],
    size_cap: int | None = None,
    cache_key: str | None = None,
) -> int:
    """Σ min-filtered group_size² over ``df`` grouped by ``key_cols`` —
    an upper bound on the row count of a same-key pair self-join (the
    full both-directions product; triangular joins emit about half).

    ``size_cap`` drops groups larger than the cap BEFORE squaring,
    mirroring pair generators that filter oversized groups (the basket
    caps) rather than cap-then-pair. One cheap scan + two aggregates.
    """
    spark = df.sparkSession
    memo = None
    if cache_key is not None:
        memo = (spark.sparkContext.applicationId, cache_key)
        hit = _BOUND_CACHE.get(memo)
        if hit is not None:
            return hit
    sizes = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_sz"))
    if size_cap is not None:
        sizes = sizes.filter(F.col("_sz") <= size_cap)
    bound = int(
        sizes.agg(F.sum(F.col("_sz") * F.col("_sz"))).head()[0] or 0
    )
    if memo is not None:
        _BOUND_CACHE[memo] = bound
    return bound


def pair_exchange_partitions(spark: SparkSession, bound_rows: int) -> int:
    """Partition count for a pair exchange carrying ``bound_rows`` rows:
    ~1M pair rows per task, floored at the session's shuffle
    parallelism (small corpora keep their current plans) and capped at
    4096 (beyond which task overhead dominates on any realistic
    executor fleet)."""
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return max(
        cap,
        min(
            PAIR_MAX_PARTITIONS,
            -(-int(bound_rows) // PAIR_ROWS_PER_PARTITION),
        ),
    )


def volume_repartition_pairs(
    pairs: DataFrame, pair_keys: list[str], bound_rows: int
) -> DataFrame:
    """Hash-repartition the candidate-pair stream on its aggregation
    key, sized by volume. Place IMMEDIATELY before the pair groupBy so
    Catalyst elides the aggregate's own exchange."""
    n = pair_exchange_partitions(pairs.sparkSession, bound_rows)
    return pairs.repartition(n, *pair_keys)
