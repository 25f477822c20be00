"""Build a 10× replica of an sf dir for the scale smoke (VERDICT r5
next #5): the 100 TB argument needs at least one measured sf0.1→sf1
scaling ratio per expensive query, not just plan-shape reasoning.

Scaling recipe — "10 disjoint copies", the honest way to 10× a corpus
without changing its per-copy statistics:
  - lineitem/orders: key columns offset by copy × (max_key + 1), so the
    order/basket/co-occurrence structure repeats 10× disjointly (10×
    edges, 10× baskets, 10× agg groups).
  - documents: doc_id offset; the text HEAD gets a per-copy prefix so
    content-derived keys (MinHash bands, pHash/audio seeds = head
    digest) do NOT collide across copies — near-dup family structure is
    preserved within each copy, and candidate-pair volume scales ~10×
    like a real corpus, not ~100× like naive duplication would.
  - customer/part/supplier: replicated with the SAME key offsets the
    facts use (ADVICE r6: symlinking them unscaled left copies 1..N-1
    of orders/lineitem with dangling FKs, so any dim-join smoke query
    silently dropped (N-1)/N of the fact rows). Nation/region keys are
    never offset, so the dims' *_nationkey columns stay valid.
  - events: event_id/user_id offset (VERDICT r10 next #5) — the
    session/funnel/dwell family scales by disjoint users; timestamps
    repeat per copy, so per-user temporal structure is preserved.
  - embeddings: vec_id offset, and copies i >= 1 get a DETERMINISTIC
    per-copy vector perturbation (VERDICT r11 next #3 — exact cross-copy
    twins made ANN-recall evidence volume-only): component ((i*7)%64)+1
    is translated by 0.4*i (copies drift into distinct regions, like a
    sharded corpus), and every component gets an integer-hash jitter of
    amplitude 0.02*i keyed on (new vec_id, pos) — a Knuth multiplicative
    mix, version-independent arithmetic, reproducible bit-for-bit on
    rebuild. Copy 0 stays byte-identical to the source, so sf0.1-vs-10x
    comparisons keep one unperturbed anchor copy. Both engines read the
    same parquet, so oracles are unaffected; nearest-neighbor structure
    is now copy-dependent and non-degenerate (no distance-0 ties).
  - region/nation are symlinked (never offset).

Usage: python tools/make_scale_dir.py [src_sf_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_scale"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def p(name: str, d: str = "") -> str:
        return os.path.join(d or src, f"{name}.parquet")

    def off(table: str, col: str) -> int:
        return con.execute(
            f"SELECT MAX({col}) + 1 FROM read_parquet('{p(table)}')"
        ).fetchone()[0]

    # Offsets come from the table that OWNS each key (ADVICE r7): a dim
    # may hold keys above the max the facts reference (customers with no
    # orders, parts never ordered) — offsetting by the fact-side max
    # would make dim copies collide and silently fan out every dim join
    # in the smoke. The fact FK columns reuse the dim-owned offset, so
    # copies stay disjoint AND referentially intact.
    ok, ck, pk, sk = (
        off("orders", "o_orderkey"),
        off("customer", "c_custkey"),
        off("part", "p_partkey"),
        off("supplier", "s_suppkey"),
    )
    dk = off("documents", "doc_id")

    con.execute(f"""
        COPY (SELECT o_orderkey + i * {ok} AS o_orderkey,
                     o_custkey + i * {ck} AS o_custkey,
                     * EXCLUDE (o_orderkey, o_custkey, i)
              FROM read_parquet('{p("orders")}') CROSS JOIN range({factor}) t(i))
        TO '{p("orders", dst)}' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (SELECT l_orderkey + i * {ok} AS l_orderkey,
                     l_partkey + i * {pk} AS l_partkey,
                     l_suppkey + i * {sk} AS l_suppkey,
                     * EXCLUDE (l_orderkey, l_partkey, l_suppkey, i)
              FROM read_parquet('{p("lineitem")}') CROSS JOIN range({factor}) t(i))
        TO '{p("lineitem", dst)}' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (SELECT doc_id + i * {dk} AS doc_id,
                     'c' || i || ' ' || text AS text,
                     * EXCLUDE (doc_id, text, i)
              FROM read_parquet('{p("documents")}') CROSS JOIN range({factor}) t(i))
        TO '{p("documents", dst)}' (FORMAT PARQUET)
    """)
    for table, col, key_off in (
        ("customer", "c_custkey", ck),
        ("part", "p_partkey", pk),
        ("supplier", "s_suppkey", sk),
    ):
        # a pre-fix run symlinked these; COPY through the symlink would
        # try to write into the read-only testdata dir
        if os.path.islink(p(table, dst)):
            os.unlink(p(table, dst))
        con.execute(f"""
            COPY (SELECT {col} + i * {key_off} AS {col},
                         * EXCLUDE ({col}, i)
                  FROM read_parquet('{p(table)}') CROSS JOIN range({factor}) t(i))
            TO '{p(table, dst)}' (FORMAT PARQUET)
        """)
    ek, uk = off("events", "event_id"), off("events", "user_id")
    vk = off("embeddings", "vec_id")
    for table, sql in (
        ("events", f"""
            SELECT event_id + i * {ek} AS event_id,
                   user_id + i * {uk} AS user_id,
                   * EXCLUDE (event_id, user_id, i)
            FROM read_parquet('{p("events")}') CROSS JOIN range({factor}) t(i)
         """),
        ("embeddings", f"""
            SELECT vec_id + i * {vk} AS vec_id,
                   CAST(CASE WHEN i = 0 THEN embedding ELSE
                     list_transform(embedding, (x, pos) ->
                       x
                       + CASE WHEN pos = ((i * 7) % 64) + 1
                              THEN 0.4 * i ELSE 0.0 END
                       + ((((((vec_id + i * {vk}) * 64 + pos)
                              * 2654435761) % 4294967296) % 2001) - 1000)
                         / 1000.0 * (0.02 * i))
                   END AS FLOAT[]) AS embedding,
                   * EXCLUDE (vec_id, embedding, i)
            FROM read_parquet('{p("embeddings")}') CROSS JOIN range({factor}) t(i)
         """),
    ):
        if os.path.islink(p(table, dst)):
            os.unlink(p(table, dst))
        con.execute(
            f"COPY ({sql}) TO '{p(table, dst)}' (FORMAT PARQUET)"
        )
    for t in ("region", "nation"):
        link = p(t, dst)
        if not os.path.exists(link):
            os.symlink(p(t), link)
    for t in ("orders", "lineitem", "documents", "customer", "part",
              "supplier", "events", "embeddings"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{p(t, dst)}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {p(t, dst)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
