"""Round-6 additions: link prediction (Adamic–Adar, rich club),
gaps-and-islands, seasonal residuals, period detection, Theil index,
KMV union sketch, mixture quota, bigram NLL, readability, and the video
modality. Oracle parity is certified by tools/check_oracle.py /
the driver gate; these tests pin the INVARIANTS the oracles can't
express (conservation laws, estimator bounds, container round-trips,
partition invariance)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_adamic_adar_weights_consistent(spark, sf_dir):
    """Every returned pair's n_common must match the plain
    common-neighbor count (AA only reweights, never changes the wedge
    set), and aa_micro must lie within n_common·[1e6/ln(cap), 1e6/ln 2]."""
    import math

    from page_rank_mapreduce_java_spark.graph.linkpred import q_adamic_adar
    from page_rank_mapreduce_java_spark.graph.queries import (
        COMMON_NEIGHBORS_DEG_CAP,
        common_neighbor_counts,
        cooccurrence_edges,
    )

    aa = {(r.u, r.v): r for r in q_adamic_adar(spark, sf_dir).collect()}
    assert 0 < len(aa) <= 25
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    cn = {
        (r.u, r.v): r.n_common
        for r in common_neighbor_counts(
            sym, deg_cap=COMMON_NEIGHBORS_DEG_CAP
        ).collect()
    }
    lo = 1e6 / math.log(COMMON_NEIGHBORS_DEG_CAP)
    hi = 1e6 / math.log(2)
    for (u, v), r in aa.items():
        assert cn[(u, v)] == r.n_common
        assert r.n_common * lo - 1 <= r.aa_micro <= r.n_common * hi + 1


def test_rich_club_monotone_and_bounded(spark, sf_dir):
    from page_rank_mapreduce_java_spark.graph.linkpred import q_rich_club

    rows = sorted(q_rich_club(spark, sf_dir).collect(), key=lambda r: r.k)
    assert rows
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes  # deg > k nodes shrink with k
        assert b.n_edges <= a.n_edges
    for r in rows:
        assert 0 <= r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2
        assert 0 <= r.phi_ppm <= 1_000_000


def test_islands_conserve_member_months(spark, sf_dir):
    """Σ island_months · n_islands must equal the number of distinct
    (customer, month) cells — islands partition the activity set."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_orders_monthly_islands,
    )

    hist = q_orders_monthly_islands(spark, sf_dir).collect()
    total = sum(r.island_months * r.n_islands for r in hist)
    o = load_table(spark, "orders", sf_dir)
    cells = (
        o.select(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        )
        .distinct()
        .count()
    )
    assert total == cells


def test_dow_residuals_sum_to_zero_per_weekday(spark, sf_dir):
    """Σ resid_num within a weekday is identically 0 (residuals of a
    group mean) — the conservation law of seasonal adjustment."""
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_events_dow_residuals,
    )

    rows = q_events_dow_residuals(spark, sf_dir).collect()
    assert rows
    by_dow: dict[int, int] = {}
    for r in rows:
        by_dow[r.dow] = by_dow.get(r.dow, 0) + r.resid_num
    assert all(v == 0 for v in by_dow.values()), by_dow


def test_period_detect_in_range(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_events_period_detect,
    )

    r = q_events_period_detect(spark, sf_dir).collect()
    assert len(r) == 1 and 1 <= r[0].best_lag <= 7


def test_theil_nonnegative_and_gini_consistent(spark, sf_dir):
    """Theil ≥ 0 (Jensen, modulo per-term micro rounding) and agrees in
    SIGN OF INEQUALITY with a direct float recomputation."""
    import math

    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_agg_theil_nation,
    )

    r = q_agg_theil_nation(spark, sf_dir).collect()[0]
    assert r.theil_micro >= -r.n_groups  # half-up slack per group term
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", cents("o_totalprice").alias("x")
    )
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    xs = [
        row.s
        for row in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(F.sum("x").alias("s"))
        .collect()
    ]
    mu = sum(xs) / len(xs)
    t_float = sum((x / mu) * math.log(x / mu) for x in xs) / len(xs)
    assert abs(r.theil_micro / 1e6 - t_float) < 1e-3


def test_kmv_union_shape(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_sketch_kmv_union,
    )

    rows = {r.set_name: r.est_distinct for r in q_sketch_kmv_union(spark, sf_dir).collect()}
    assert set(rows) == {"click", "view", "union"}
    assert all(v > 0 for v in rows.values())
    # union of the two segments can never be smaller than ~the larger
    # one beyond sketch noise (13% at K=64)
    assert rows["union"] >= 0.8 * max(rows["click"], rows["view"])


def test_mixture_quota_sums_exactly_to_budget(spark, sf_dir):
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        MIXTURE_BUDGET,
        q_text_mixture_quota,
    )

    rows = q_text_mixture_quota(spark, sf_dir).collect()
    assert sum(r.quota for r in rows) == MIXTURE_BUDGET
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        base = MIXTURE_BUDGET * r.n_tokens // total
        assert r.quota in (base, base + 1)


def test_bigram_nll_counts_and_sign(spark, sf_dir):
    """Every doc with ≥2 tokens appears with n_bigrams = n_tokens − 1;
    add-one smoothing keeps each term ≥ 0 so sums are ≥ 0."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        q_text_bigram_nll,
    )
    from page_rank_mapreduce_java_spark.functions.textfn import words

    got = {r.doc_id: r for r in q_text_bigram_nll(spark, sf_dir).collect()}
    d = load_table(spark, "documents", sf_dir)
    ntok = {
        r.doc_id: r.n
        for r in d.select("doc_id", F.size(words(F.col("text"))).alias("n")).collect()
    }
    for doc_id, n in ntok.items():
        if n >= 2:
            assert got[doc_id].n_bigrams == n - 1
            assert got[doc_id].nll_micro >= 0
        else:
            assert doc_id not in got


def test_readability_covers_all_docs(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        q_text_readability,
    )

    rows = q_text_readability(spark, sf_dir).collect()
    n_docs = load_table(spark, "documents", sf_dir).count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.chars_per_word_milli >= 1000 or r.chars_per_word_milli == -1
        assert r.words_per_sent_milli > 0 or r.words_per_sent_milli == -1


def test_pareto_8020_brute_force(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_orders_pareto_8020,
    )

    r = q_orders_pareto_8020(spark, sf_dir).collect()[0]
    revs = sorted(
        (
        row.r
        for row in load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey")
        .agg(F.sum(cents("o_totalprice")).alias("r"))
        .collect()
        ),
        reverse=True,
    )
    total = sum(revs)
    cum, k = 0, 0
    for v in revs:
        cum += v
        k += 1
        if cum * 5 >= total * 4:
            break
    assert (r.n_customers, r.k_top, r.topk_cents, r.total_cents) == (
        len(revs), k, cum, total,
    )
    assert r.share_ppm >= 800_000


def test_transition_entropy_bounds(spark, sf_dir):
    import math

    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_events_transition_entropy,
    )

    r = q_events_transition_entropy(spark, sf_dir).collect()[0]
    assert 0 <= r.entropy_rate_micro <= math.log(5) * 1e6 + 1
    assert r.n_transitions > 0


def test_basket_lift_vs_brute_force(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        LIFT_BASKET_CAP,
        q_basket_lift_pairs,
    )
    from page_rank_mapreduce_java_spark.catalog import load_table

    rows = q_basket_lift_pairs(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    lifts = [r.lift_micro for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    baskets: dict[int, set[int]] = {}
    for r in (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    ):
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    baskets = {k: v for k, v in baskets.items() if len(v) <= LIFT_BASKET_CAP}
    nb = len(baskets)
    top = rows[0]
    c_ab = sum(1 for v in baskets.values() if top.p1 in v and top.p2 in v)
    c1 = sum(1 for v in baskets.values() if top.p1 in v)
    c2 = sum(1 for v in baskets.values() if top.p2 in v)
    assert top.c_ab == c_ab >= 2
    assert top.lift_micro == round(nb * c_ab / (c1 * c2) * 1e6)


def test_jsd_bounds_and_float_agreement(spark, sf_dir):
    import math

    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.text_queries3 import (
        JSD_LANG_A,
        JSD_LANG_B,
        q_text_js_divergence,
    )
    from page_rank_mapreduce_java_spark.functions.textfn import words

    r = q_text_js_divergence(spark, sf_dir).collect()[0]
    assert 0 <= r.jsd_micro <= math.log(2) * 1e6 + 1
    # float recomputation (independent path) within micro-rounding noise
    d = load_table(spark, "documents", sf_dir)
    counts: dict[str, dict[str, int]] = {JSD_LANG_A: {}, JSD_LANG_B: {}}
    for row in (
        d.filter(F.col("lang").isin(JSD_LANG_A, JSD_LANG_B))
        .select("lang", F.explode(words(F.col("text"))).alias("w"))
        .collect()
    ):
        counts[row.lang][row.w] = counts[row.lang].get(row.w, 0) + 1
    pa, pb = counts[JSD_LANG_A], counts[JSD_LANG_B]
    ta, tb = sum(pa.values()), sum(pb.values())
    vocab = set(pa) | set(pb)
    assert r.n_words_union == len(vocab)
    jsd = 0.0
    for w in vocab:
        a, b = pa.get(w, 0), pb.get(w, 0)
        p, q = a / ta, b / tb
        m = (p + q) / 2
        if a:
            jsd += p * math.log(p / m) / 2
        if b:
            jsd += q * math.log(q / m) / 2
    assert abs(r.jsd_micro / 1e6 - jsd) < 1e-3


def test_moving_median_vs_brute_force(spark, sf_dir):
    """7-row centered moving median replicated in plain Python per user."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_events_moving_median7,
    )

    got = {
        r.event_id: (r.n_win, r.med2_micro)
        for r in q_events_moving_median7(spark, sf_dir).collect()
    }
    e = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "ts", F.round(F.col("value") * 1e6).cast("long").alias("vm")
    )
    by_user: dict[int, list] = {}
    for r in e.collect():
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.vm))
    checked = 0
    for _, rows in list(by_user.items())[:50]:
        rows.sort()
        for i, (_, eid, _vm) in enumerate(rows):
            win = sorted(v for _, _, v in rows[max(0, i - 3) : i + 4])
            n = len(win)
            med2 = (
                2 * win[(n - 1) // 2]
                if n % 2 == 1
                else win[n // 2 - 1] + win[n // 2]
            )
            assert got[eid] == (n, med2)
            checked += 1
    assert checked > 100


def test_incremental_dedup_vs_brute_force(spark, sf_dir):
    """The greedy first-wins admission rule replicated in plain Python
    from the engine's own signatures: a new doc is admitted iff no band
    bucket collides with the index or an earlier new doc."""
    import hashlib

    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.dedup.queries import (
        _signatures,
        q_dedup_incremental_new_docs,
    )
    from page_rank_mapreduce_java_spark.functions.hashes import (
        LSH_BANDS,
        NUM_MINHASH,
    )

    got = {r.doc_id for r in q_dedup_incremental_new_docs(spark, sf_dir).collect()}
    sigs = {
        r.doc_id: [r[f"mh{i}"] for i in range(NUM_MINHASH)]
        for r in _signatures(spark, sf_dir).collect()
    }
    ids = load_table(spark, "documents", sf_dir).select("doc_id").collect()
    lo = min(r.doc_id for r in ids)
    hi = max(r.doc_id for r in ids)
    split = (hi + lo + 1) // 2
    rows_per_band = NUM_MINHASH // LSH_BANDS

    def buckets(doc):
        out = set()
        for j in range(LSH_BANDS):
            key = ",".join(
                str(sigs[doc][j * rows_per_band + k]) for k in range(rows_per_band)
            )
            out.add((j, hashlib.md5(key.encode()).hexdigest()))
        return out

    seen: set = set()
    for doc in sorted(sigs):
        if doc < split:
            seen |= buckets(doc)
    expect = set()
    for doc in sorted(d for d in sigs if d >= split):
        b = buckets(doc)
        if not (b & seen):
            expect.add(doc)
        seen |= b
    assert got == expect
    assert expect and expect < {d for d in sigs if d >= split}


def test_degree_gini_vs_brute_force(spark, sf_dir):
    import math

    from page_rank_mapreduce_java_spark.graph.linkpred import q_degree_gini
    from page_rank_mapreduce_java_spark.graph.queries import cooccurrence_edges

    r = q_degree_gini(spark, sf_dir).collect()[0]
    e = cooccurrence_edges(spark, sf_dir)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    degs = sorted(
        row.d
        for row in sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).collect()
    )
    n, sd = len(degs), sum(degs)
    num = sum((2 * (i + 1) - n - 1) * d for i, d in enumerate(degs))
    assert (r.n_nodes, r.sum_degree) == (n, sd)
    assert r.gini_ppm == round(num / (n * sd) * 1e6)
    assert 0 <= r.gini_ppm < 1_000_000


def test_method_agreement_consistent_with_pair_sets(spark, sf_dir):
    from page_rank_mapreduce_java_spark.dedup.queries import (
        q_dedup_method_agreement,
        q_dedup_minhash_lsh_pairs,
        q_dedup_simhash_pairs,
    )

    r = q_dedup_method_agreement(spark, sf_dir).collect()[0]
    lsh = {(p.doc_a, p.doc_b) for p in q_dedup_minhash_lsh_pairs(spark, sf_dir).collect()}
    simp = {(p.doc_a, p.doc_b) for p in q_dedup_simhash_pairs(spark, sf_dir).collect()}
    assert (r.n_lsh, r.n_simhash, r.n_both) == (
        len(lsh), len(simp), len(lsh & simp),
    )
    assert r.jaccard_ppm == round(len(lsh & simp) / len(lsh | simp) * 1e6)


def test_markov_stationary_is_fixed_point(spark, sf_dir):
    """The emitted distribution must (a) sum to ~1e6 and (b) be a fixed
    point of one more ppm-matrix application (brute-forced in Python
    from the same transition counts)."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_events_markov_stationary,
    )
    from pyspark.sql.window import Window as W

    v = {r.state: r.stationary_ppm for r in q_events_markov_stationary(spark, sf_dir).collect()}
    assert abs(sum(v.values()) - 1_000_000) <= len(v) * 2
    e = load_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    tr: dict = {}
    for r in (
        e.withColumn("dst", F.lead("event_type").over(w))
        .filter(F.col("dst").isNotNull())
        .groupBy(F.col("event_type").alias("src"), "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ):
        tr[(r.src, r.dst)] = r.n
    ni = {}
    for (s, _), n in tr.items():
        ni[s] = ni.get(s, 0) + n
    nxt = {}
    for (s, d), n in tr.items():
        p_ppm = round(n / ni[s] * 1e6)
        nxt[d] = nxt.get(d, 0) + v[s] * p_ppm
    nxt = {d: round(x / 1e6) for d, x in nxt.items()}
    assert nxt == v


def test_cohort_ltv_conserves_revenue(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.functions.money import cents
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_orders_cohort_ltv,
    )

    rows = q_orders_cohort_ltv(spark, sf_dir).collect()
    assert all(r.age_months >= 0 for r in rows)
    total = (
        load_table(spark, "orders", sf_dir)
        .agg(F.sum(cents("o_totalprice")).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.revenue_cents for r in rows) == total


def test_dq_pk_audit_matches_table_counts(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        _PK_AUDIT,
        q_dq_duplicate_key_audit,
    )

    got = {r.table_name: r for r in q_dq_duplicate_key_audit(spark, sf_dir).collect()}
    assert set(got) == {t for t, _ in _PK_AUDIT}
    for t, _k in _PK_AUDIT:
        n = load_table(spark, t, sf_dir).count()
        assert got[t].n_rows == n
        assert got[t].n_dup_keys == 0  # fixture keys are clean
        assert got[t].n_keys == n


def test_ship_lag_quantiles_ordered(spark, sf_dir):
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_order_ship_lag_quantiles,
    )

    rows = q_order_ship_lag_quantiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p25 <= r.p50 <= r.p90


def test_rvid_container_roundtrip():
    from page_rank_mapreduce_java_spark.multimodal.videofp import (
        _decode_rvid,
        _encode_rvid,
    )

    frames = [b"abc", b"", b"x" * 100, b"\x00\xff"]
    assert _decode_rvid(_encode_rvid(frames)) == frames


def test_video_keeper_stream_matches_batch(spark):
    """Stream-mode video keepers match the batch twin (the dual-mode
    contract all three modality keepers share)."""
    import tempfile

    from page_rank_mapreduce_java_spark.multimodal.videofp import (
        video_keeper_stream,
    )
    from page_rank_mapreduce_java_spark.streaming.events import (
        run_stream_to_memory,
    )

    rows = [
        (i, f"streamed doc {i} body", f"2024-03-01 10:{i:02d}:00")
        for i in range(8)
    ] + [
        (100, "streamed doc 2 body", "2024-03-01 11:00:00"),
        (101, "streamed doc 2 body", "2024-03-01 11:01:00"),
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, ts_s string"
    ).select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
    src = tempfile.mkdtemp(prefix="vdocs_stream_")
    for lo, hi in ((0, 5), (5, 102)):
        batch.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
    stream = video_keeper_stream(
        spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        watermark="1 day",
    )
    assert stream.isStreaming
    run_stream_to_memory(stream, "video_keepers_out")
    got = {
        (r.doc_id, r.vfp)
        for r in spark.sql("SELECT * FROM video_keepers_out").collect()
    }
    exp = {(r.doc_id, r.vfp) for r in video_keeper_stream(batch).collect()}
    assert got == exp and len(got) == 8
    assert all(d < 100 for d, _ in got)


def test_asof_nearest_vs_bruteforce(spark, sf_dir):
    """join_asof_nearest must agree with a brute-force per-event argmin
    over |event − order| with ties to the earlier order."""
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.operators.relational12 import (
        q_join_asof_nearest,
    )

    got = {
        r.event_id: (r.nearest_orderkey, r.delta_us)
        for r in q_join_asof_nearest(spark, sf_dir).collect()
    }
    e = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", F.unix_micros("ts").alias("tsu")
    )
    o = (
        load_table(spark, "orders", sf_dir)
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("okey"))
        .select(
            F.col("o_custkey").alias("user_id"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("otsu"),
            "okey",
        )
    )
    orders_by_user: dict[int, list[tuple[int, int]]] = {}
    for r in o.collect():
        orders_by_user.setdefault(r.user_id, []).append((r.otsu, r.okey))
    n_checked = 0
    for r in e.limit(300).collect():
        cands = orders_by_user.get(r.user_id)
        if not cands:
            assert r.event_id not in got
            continue
        best = min(cands, key=lambda c: (abs(r.tsu - c[0]), c[0] > r.tsu))
        assert got[r.event_id] == (best[1], r.tsu - best[0])
        n_checked += 1
    assert n_checked > 50


def test_video_fingerprint_partition_invariant_and_pairs(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table
    from page_rank_mapreduce_java_spark.multimodal.videofp import (
        documents_to_video,
        q_mm_video_fp_pairs,
        video_fingerprint,
    )

    d = load_table(spark, "documents", sf_dir)
    a = sorted(
        map(tuple, video_fingerprint(documents_to_video(d.repartition(2))).collect())
    )
    b = sorted(
        map(tuple, video_fingerprint(documents_to_video(d.repartition(13))).collect())
    )
    assert a == b and len(a) == d.count()
    pairs = q_mm_video_fp_pairs(spark, sf_dir).collect()
    # the corpus plants shared-head near-dup families -> exact matches
    assert any(r.hamming == 0 for r in pairs)
    assert all(0 <= r.hamming <= 3 and r.doc_a < r.doc_b for r in pairs)
