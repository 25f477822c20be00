"""Skew mitigation utilities.

AQE's skew-join handling (enabled in session.py) covers sort-merge joins
at runtime; this module adds *explicit* key salting for the cases AQE
can't rewrite — aggregations over power-law keys and broadcast-ineligible
skewed joins. The pattern: split a hot key into ``salt_buckets`` subkeys,
do the heavy shuffle on the salted key, then reduce the partial results.

At 100 TB a handful of celebrity keys (the node-0 sink in the reference's
own graph is exactly this: every chain tail points at it) can hold a whole
stage hostage; two-phase aggregation bounds any single task's input.

Retry semantics: pass ``salt_on`` (a stable, unique row key) whenever one
exists — that salt is fully deterministic under task retry. Without it
the salt falls back to ``monotonically_increasing_id``, which is
position-based: if the input's own partition/row order is not
deterministic (e.g. it is itself a shuffle output) a retried task can
re-salt rows differently. Decomposable aggregates (sum/count) still
reduce to the same totals; don't use the fallback under non-deterministic
inputs with order-sensitive consumers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    buckets: int,
    salt_col: str = "_salt",
    salt_on: str | None = None,
) -> DataFrame:
    """Append a per-row salt in [0, buckets). ``salt_on``: name of a
    stable unique column to hash (retry-deterministic); default falls
    back to row position (see module docstring). Any pre-existing
    ``salt_col`` is overwritten."""
    src = F.col(salt_on) if salt_on else F.monotonically_increasing_id()
    return df.withColumn(salt_col, F.pmod(F.hash(src), F.lit(buckets)))


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: Column,
    alias: str,
    buckets: int = 16,
    merge: str = "sum",
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``agg_col`` per (key, salt), then ``merge``
    (the name of a re-aggregation: 'sum', 'min', 'max', ...) per key. Any
    single reducer task sees at most ~1/buckets of a hot key.

    The pair must be algebraically decomposable: partial-X then merge-Y
    must equal X over the whole group (sum/sum, count/sum, min/min,
    max/max). Non-decomposable aggregates (avg, median, count distinct)
    need their own decomposition — e.g. avg = salted sum / salted count.
    """
    salted = with_salt(df, buckets, salt_on=salt_on)
    partial = salted.groupBy(key, "_salt").agg(agg_col.alias("_partial"))
    merge_fn = getattr(F, merge)
    return partial.groupBy(key).agg(merge_fn("_partial").alias(alias))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Skewed big ⋈ small equi-join: salt the big side per-row, replicate
    the small side across all buckets, join on (key, salt). Use when the
    small side is too large to broadcast but the big side's key
    distribution is power-law."""
    big_s = with_salt(big, buckets, salt_on=salt_on)
    salts = big.sparkSession.range(buckets).select(F.col("id").cast("int").alias("_salt"))
    small_r = small.crossJoin(salts)
    return big_s.join(small_r, [key, "_salt"]).drop("_salt")


def salted_join_hot_keys(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salts: int = 8,
    salt_src: Column | None = None,
) -> DataFrame:
    """Inner equi-join on ``key`` where ONLY the listed hot keys are
    split into ``n_salts`` sub-keys — the targeted variant of
    ``salted_join`` above (which replicates the whole small side when
    the entire key distribution is power-law; this one replicates just
    the hot dimension rows, so cold keys pay nothing).

    ``hot_keys``: small DataFrame[key] of the skewed values (from a
    stats pass such as the dq_join_key_skew census, or a heavy-hitter
    sketch); broadcast twice. Fact rows on a hot key get salt =
    xxhash64(salt_src) % n_salts (``salt_src`` defaults to the key
    itself — pass a finer-grained column for real spread; any
    deterministic expression works, the salt never reaches the output).
    Dim rows on a hot key are replicated once per salt via an inline
    explode; cold rows on both sides carry salt 0. The join key becomes
    (key, salt), so a hot key's rows spread over ``n_salts`` reducers
    instead of one straggler. Result is row-identical to
    ``fact.join(dim, key)``.
    """
    if salt_src is None:
        salt_src = F.col(key)
    hk = F.broadcast(hot_keys.select(F.col(key)).withColumn("_hot", F.lit(1)))
    f = (
        fact.join(hk, key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(salt_src), F.lit(n_salts)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    d = (
        dim.join(hk, key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(),
                F.sequence(F.lit(0), F.lit(n_salts - 1)),
            ).otherwise(F.array(F.lit(0))),
        )
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts", "_hot")
    )
    return f.join(d, [key, "_salt"]).drop("_salt")
