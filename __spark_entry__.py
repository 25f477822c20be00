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


_ENGINE_PKG = "page_rank_mapreduce_java_spark"
_IMPORT_RE = None  # compiled lazily; re imported only if needed


def _fn_source(fn) -> str:
    try:
        return inspect.getsource(fn)
    except (OSError, TypeError):  # builtins/partials: fall back to repr
        return repr(fn)


def _dependency_sources(fn: Callable) -> list[str]:
    """Sources of every ENGINE function the query transitively calls.

    Editing an operator helper (global_percent_rank, salted joins,
    interval pairing, ...) must stale its dependent green queries exactly
    like editing the query function itself (ADVICE r3: the stale-green
    class the ledger was built to prevent). Resolution is mechanical and
    deterministic: a function's referenced names (``co_names``) looked up
    in its module globals, plus ``from <engine pkg> import name`` lines in
    its body (local imports don't land in globals), recursively over any
    resolved engine-package function. Appending an UNRELATED function to
    a module stales nothing — only functions on the call path count.
    Caveat (same as before): hashes must be computed in a process that
    imported the CURRENT on-disk source; inspect.getsource after an
    in-process edit returns garbage line ranges."""
    global _IMPORT_RE
    import importlib
    import re as _re
    import types

    if _IMPORT_RE is None:
        _IMPORT_RE = _re.compile(
            rf"from\s+({_ENGINE_PKG}[\w.]*)\s+import\s+\(?([\w,\s]+?)\)?\s*$",
            _re.MULTILINE,
        )
    out: dict[tuple[str, str], str] = {}
    stack = [fn]
    while stack:
        f = stack.pop()
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        src = _fn_source(f)
        candidates = []
        gl = getattr(f, "__globals__", {})
        for name in code.co_names:
            candidates.append(gl.get(name))
        for mod_name, names in _IMPORT_RE.findall(src):
            try:
                mod = importlib.import_module(mod_name)
            except ImportError:
                continue
            for n in _re.split(r"[,\s]+", names):
                if n:
                    candidates.append(getattr(mod, n, None))
        for obj in candidates:
            if (
                isinstance(obj, types.FunctionType)
                and getattr(obj, "__module__", "").startswith(_ENGINE_PKG)
            ):
                key = (obj.__module__, obj.__qualname__)
                if key not in out:
                    out[key] = _fn_source(obj)
                    stack.append(obj)
    return [out[k] for k in sorted(out)]


def query_hash(fn: Callable, oracle: str | None) -> str:
    """Source hash for staleness detection: the query function's own
    source, the sources of every engine helper it transitively calls
    (see _dependency_sources), and its fully-rendered oracle SQL (which
    captures SQL-building helpers because the strings are rendered at
    import)."""
    payload = "\x00".join(
        [_fn_source(fn), *_dependency_sources(fn), oracle or ""]
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


# NOTE on round numbering: the repo's internal round log (PERF.md)
# counts two working rounds here — "round 9" (the original
# certification round, whose driver artifact never landed) and
# "round 10" (this re-run of the same drain). The DRIVER's artifact
# numbering continues from CORRECTNESS_r08.json, so the window below
# is graded as the driver's ROUND 9 (CORRECTNESS_r09.json /
# BENCH_r09.json). Same window either way; "round 11" in these
# comments = the driver's round 10.
#
# Window math for the driver's round 11 (the repo's internal round 12):
# CORRECTNESS_r10 landed 50/50 green and the ledger folded it — the
# registry is fully driver-certified (0 never-checked, 0 fail/stale).
# Nothing is owed a pinned slot; anything round 11 registers or stales
# (e.g. the ADVICE-r10 JL-sign fix recert) sorts into the window by
# the evidence groups below.
_PRIORITY_THIS_ROUND: tuple[str, ...] = ()

# Empty: the full registry is green; no deferrals outstanding.
_DEFER_TO_NEXT_ROUND: frozenset[str] = frozenset()


def _audit_order(q: dict, o: dict) -> list[str]:
    try:
        with open(_EVIDENCE_PATH) as f:
            evidence = json.load(f)
    except (OSError, json.JSONDecodeError):
        evidence = {}

    def group(name: str) -> int:
        if name == "agg_approx_distinct":
            return 5
        if name in _DEFER_TO_NEXT_ROUND:
            return 4
        if name in _PRIORITY_THIS_ROUND:
            return 0  # pinned slots: never OR stale, both must be graded
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

    def priority(name: str) -> int:
        # Within a group, round-specific pulls sort first (the r9
        # deferrals must not miss a second consecutive window).
        try:
            return _PRIORITY_THIS_ROUND.index(name)
        except ValueError:
            return len(_PRIORITY_THIS_ROUND)

    names = list(q)
    return sorted(names, key=lambda n: (group(n), priority(n),
                                        names.index(n)))


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
