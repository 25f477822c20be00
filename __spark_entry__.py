"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship iterative PageRank on the sf0.001 corpus.
``queries()`` / ``oracle_sql()`` aggregate the per-module query registries;
every relational/graph/extension operator is registered with a DuckDB
oracle (queries without one get the driver's weaker rows-only check and are
flagged in the module docstrings).

Audit ordering: the driver's per-round correctness gate checks the FIRST
50 registry entries, so iteration order decides what earns driver-side
evidence. Order is derived mechanically from ``query_evidence.json``
(written by tools/update_query_evidence.py after each driver round):

  group 0 — recorded never-driver-checked (in the ledger with "never");
  group 1 — last driver check FAILED, or the query's (function source +
            oracle SQL) hash changed since the recorded green — a changed
            query must re-earn its green (the r2 stale-green incident:
            two queries rewritten in r2 kept coasting on r1 greens);
  group 2 — brand-new (absent from the ledger entirely): queries added
            mid-round queue BEHIND the recorded backlog so they cannot
            evict a failed/stale recertification from an exactly-full
            window; they earn driver evidence next round;
  group 3 — green and unchanged;
  tail    — agg_approx_distinct (oracle-less by design; HLL estimates are
            engine-specific) never occupies an audit slot.

Within each group, module registration order is kept (deterministic).
If the evidence file is missing, every query counts as never-checked —
strictly safe, just wasteful.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_EVIDENCE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "query_evidence.json")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from page_rank_mapreduce_java_spark.graph.queries import q_pagerank

    return q_pagerank(spark, "/root/testdata/sf0.001")


def query_hash(fn: Callable, oracle: str | None) -> str:
    """Source hash for staleness detection: the query function's own source
    plus its fully-rendered oracle SQL. Helper functions the Spark side
    calls are not captured (acceptable approximation — oracles embedding
    helper SQL ARE captured because the strings are rendered at import)."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins/partials: fall back to repr
        src = repr(fn)
    payload = src + "\x00" + (oracle or "")
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _audit_order(q: dict, o: dict) -> list[str]:
    try:
        with open(_EVIDENCE_PATH) as f:
            evidence = json.load(f)
    except (OSError, json.JSONDecodeError):
        evidence = {}

    def group(name: str) -> int:
        if name == "agg_approx_distinct":
            return 4
        ev = evidence.get(name)
        if ev is None:
            return 2  # brand-new this round: behind the recorded backlog
        if ev.get("driver") == "never":
            return 0
        if str(ev.get("driver", "")).startswith("fail"):
            return 1
        if ev.get("hash") != query_hash(q[name], o.get(name)):
            return 1  # changed since last driver green -> re-earn it
        return 3

    names = list(q)
    return sorted(names, key=lambda n: (group(n), names.index(n)))


def _registry() -> tuple[dict, dict]:
    # One aggregation point for the whole engine (CLI included):
    # page_rank_mapreduce_java_spark.cli.full_registry. Import errors
    # propagate — silently shrinking the registry would make the
    # correctness gate pass on fewer queries without anyone noticing.
    from page_rank_mapreduce_java_spark.cli import full_registry

    q, o = full_registry()
    order = _audit_order(q, o)
    return {n: q[n] for n in order}, {n: o[n] for n in order if n in o}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
