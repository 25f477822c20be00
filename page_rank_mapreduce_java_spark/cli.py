"""CLI entry point (SURVEY.md §2.10 C4).

The reference is driven as
``hadoop jar Page-Rank-MapReduce.jar prJava.PageRank_v2 <Input> <Output>
<maxLinks> <Iterations>`` (reference pageRank_v2.java:45-54, Makefile:48).
The equivalent here:

    python -m page_rank_mapreduce_java_spark pagerank \
        --input input/input-graph.txt --output output/ranks \
        --iterations 10 --damping 0.85 [--text-format]

plus a ``chaingen`` subcommand for the reference's synthetic k-chains
graph (Makefile:23 ``aws.k``) and ``init-state`` for the golden init pass.
"""

from __future__ import annotations

import argparse
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="page_rank_mapreduce_java_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("pagerank", help="iterative PageRank over a CSV edge list")
    pr.add_argument("--input", required=True, help="CSV edge list dir/file (src,dst)")
    pr.add_argument("--output", required=True, help="output directory")
    pr.add_argument("--iterations", type=int, default=10)
    pr.add_argument("--damping", type=float, default=0.85)
    pr.add_argument("--tol", type=float, default=None, help="early-stop L1 tolerance")
    pr.add_argument("--partitions", type=int, default=None)
    pr.add_argument(
        "--text-format",
        action="store_true",
        help="write id,rank CSV text instead of parquet",
    )

    cg = sub.add_parser("chaingen", help="generate the reference's k-chains graph")
    cg.add_argument("--k", type=int, required=True)
    cg.add_argument("--output", required=True)

    ins = sub.add_parser(
        "init-state", help="reference init pass (golden-output text format)"
    )
    ins.add_argument("--input", required=True)
    ins.add_argument("--k", type=int, required=True)
    ins.add_argument("--output", required=True)

    q = sub.add_parser(
        "query", help="run any registered engine query over a table directory"
    )
    q.add_argument("name", help="query name (see list-queries)")
    q.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="directory holding the parquet tables",
    )
    q.add_argument("--output", default=None, help="parquet output dir (default: show)")
    q.add_argument(
        "--show", type=int, default=20, help="rows to print when no --output"
    )

    dd = sub.add_parser(
        "dedup",
        help="end-to-end corpus dedup: documents parquet in, keeper "
        "assignments parquet out",
    )
    dd.add_argument("--input", required=True, help="documents parquet dir (doc_id, text)")
    dd.add_argument("--output", required=True, help="parquet output dir")
    dd.add_argument(
        "--method",
        choices=["exact", "minhash", "phash"],
        default="minhash",
        help="exact digest | MinHash-LSH near-dup clusters | perceptual image hash",
    )

    sub.add_parser("list-queries", help="list all registered query names")

    sq = sub.add_parser(
        "sql",
        help="run ad-hoc SQL over the table catalog (tables registered "
        "as views: region nation customer supplier part orders lineitem "
        "events documents embeddings)",
    )
    sq.add_argument("statement", help="a single SQL statement")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sq.add_argument("--output", default=None, help="parquet output dir (default: show)")
    sq.add_argument("--show", type=int, default=20)

    ex = sub.add_parser(
        "explain",
        help="print the formatted physical plan of a registered query "
        "(the audit surface PLANS.md rows come from)",
    )
    ex.add_argument("name", help="query name (see list-queries)")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    return p


def full_registry() -> tuple[dict, dict]:
    """THE aggregation point for (QUERIES, ORACLES) across all query
    modules — `cli query X` and the driver contract
    (`__spark_entry__._registry`) both read from here, so a module can
    never be registered in one surface and silently missing from the
    other. Import errors must propagate: silently shrinking the
    registry would make the correctness gate pass on fewer queries
    without anyone noticing."""
    from page_rank_mapreduce_java_spark.dedup import queries as dedup_queries
    from page_rank_mapreduce_java_spark.functions import (
        text_queries,
        text_queries2,
        text_queries3,
    )
    from page_rank_mapreduce_java_spark.graph import linkpred
    from page_rank_mapreduce_java_spark.graph import queries as graph_queries
    from page_rank_mapreduce_java_spark.operators import (
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        relational8,
        relational9,
        relational10,
        relational11,
        relational12,
        relational13,
        relational14,
        relational15,
        relational16,
        relational17,
        relational18,
        relational19,
        relational20,
        relational21,
        relational22,
        relational23,
        relational24,
        relational25,
        relational26,
        relational27,
        relational28,
        relational29,
        relational30,
        relational31,
        relational32,
        relational33,
        relational34,
        relational35,
        relational36,
        relational37,
        relational38,
        relational39,
        relational40,
        recommend,
    )
    from page_rank_mapreduce_java_spark.multimodal import audiofp as mm_audiofp
    from page_rank_mapreduce_java_spark.multimodal import phash as mm_phash
    from page_rank_mapreduce_java_spark.multimodal import videofp as mm_videofp
    from page_rank_mapreduce_java_spark.similarity import queries as sim_queries
    from page_rank_mapreduce_java_spark.streaming import queries as stream_queries

    q: dict = {}
    o: dict = {}
    for m in (
        graph_queries,
        linkpred,
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        relational7,
        relational8,
        relational9,
        relational10,
        relational11,
        relational12,
        relational13,
        relational14,
        relational15,
        relational16,
        relational17,
        relational18,
        relational19,
        relational20,
        relational21,
        relational22,
        relational23,
        relational24,
        relational25,
        relational26,
        relational27,
        relational28,
        relational29,
        relational30,
        relational31,
        relational32,
        relational33,
        relational34,
        relational35,
        relational36,
        relational37,
        relational38,
        relational39,
        relational40,
        recommend,
        dedup_queries,
        sim_queries,
        mm_phash,
        mm_audiofp,
        mm_videofp,
        text_queries,
        text_queries2,
        text_queries3,
        stream_queries,
    ):
        q.update(m.QUERIES)
        o.update(m.ORACLES)
    return q, o


def _registry():
    return full_registry()[0]


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    if args.cmd == "list-queries":
        for name in sorted(_registry()):
            print(name)
        return 0

    from pyspark.sql import functions as F

    from page_rank_mapreduce_java_spark.session import get_spark
    from page_rank_mapreduce_java_spark.graph.generators import chain_edges
    from page_rank_mapreduce_java_spark.graph.pagerank import pagerank, reference_init_state
    from page_rank_mapreduce_java_spark.sources.readers import read_edge_csv
    from page_rank_mapreduce_java_spark.sources.writers import write_state_text

    spark = get_spark(app_name=f"cli:{args.cmd}")

    if args.cmd == "pagerank":
        edges = read_edge_csv(spark, args.input)
        res = pagerank(
            edges,
            num_iterations=args.iterations,
            damping=args.damping,
            tol=args.tol,
            partitions=args.partitions,
        )
        if args.text_format:
            (
                res.ranks.orderBy("id")
                .select(F.concat_ws(",", F.col("id"), F.col("rank")).alias("value"))
                .coalesce(1)
                .write.mode("overwrite")
                .text(args.output)
            )
        else:
            res.ranks.write.mode("overwrite").parquet(args.output)
        print(
            f"pagerank: {res.num_nodes} nodes, {res.iterations_run} iterations "
            f"-> {args.output}"
        )
    elif args.cmd == "chaingen":
        (
            chain_edges(spark, args.k)
            .select(F.concat_ws(",", "src", "dst").alias("value"))
            .coalesce(1)
            .write.mode("overwrite")
            .text(args.output)
        )
        print(
            f"chaingen: k={args.k} ({args.k * args.k} chain nodes + sink 0) -> {args.output}"
        )
    elif args.cmd == "init-state":
        edges = read_edge_csv(spark, args.input)
        write_state_text(reference_init_state(edges, args.k), args.output)
        print(f"init-state: k={args.k} -> {args.output}")
    elif args.cmd == "dedup":
        # The LLM-pipeline entry point: one command from a raw document
        # corpus to keeper assignments, on the same certified operators
        # the registry exposes (dedup/queries.py, multimodal/phash.py).
        # The registered dedup functions read through the table catalog
        # (load_table(sf_dir)), so expose the input as a documents table
        # via a symlinked temp dir rather than forking their signatures.
        import os
        import tempfile

        # TemporaryDirectory so the symlink dir is removed once the
        # write completes (ADVICE r5: mkdtemp leaked one dir — with a
        # dangling-symlink risk — per invocation).
        with tempfile.TemporaryDirectory(prefix="dedup_cli_") as table_dir:
            os.symlink(
                os.path.abspath(args.input),
                os.path.join(table_dir, "documents.parquet"),
            )
            if args.method == "exact":
                from page_rank_mapreduce_java_spark.dedup.queries import q_dedup_exact

                out = q_dedup_exact(spark, table_dir)
            elif args.method == "minhash":
                from page_rank_mapreduce_java_spark.dedup.queries import (
                    q_dedup_clusters,
                )

                out = q_dedup_clusters(spark, table_dir)
            else:
                from page_rank_mapreduce_java_spark.multimodal.phash import (
                    phash_keeper_stream,
                )

                out = phash_keeper_stream(spark.read.parquet(args.input))
            out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"dedup[{args.method}]: {n} rows -> {args.output}")
    elif args.cmd == "query":
        registry = _registry()
        if args.name not in registry:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 1
        df = registry[args.name](spark, args.sf_dir)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"query {args.name}: -> {args.output}")
        else:
            df.show(args.show, truncate=False)
    elif args.cmd == "sql":
        # The user-facing escape hatch the reference never had: the full
        # Spark SQL surface over the cataloged tables (views carry the
        # catalog's type normalizations, e.g. the ns-timestamp decode).
        from page_rank_mapreduce_java_spark.catalog import register_views

        register_views(spark, args.sf_dir)
        df = spark.sql(args.statement)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"sql: -> {args.output}")
        else:
            df.show(args.show, truncate=False)
    elif args.cmd == "explain":
        registry = _registry()
        if args.name not in registry:
            print(f"unknown query {args.name!r}; see list-queries", file=sys.stderr)
            return 1
        from page_rank_mapreduce_java_spark.plans.explain import formatted_plan

        print(formatted_plan(registry[args.name](spark, args.sf_dir)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
