"""Semantics tests for the batch-2 text profile queries: brute-force
Python cross-checks over the collected corpus."""

from __future__ import annotations

import hashlib
import re


def _docs(spark, sf_dir):
    from page_rank_mapreduce_java_spark.catalog import load_table

    return load_table(spark, "documents", sf_dir).collect()


def _pywords(text):
    return [w for w in re.split(r"\s+", text.lower())]


def _pyshingles(ws, n=3):
    if len(ws) == 0:
        return set()
    if len(ws) < n:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def test_ttr_matches_bruteforce(spark, sf_dir):
    from page_rank_mapreduce_java_spark.functions.text_queries2 import (
        q_text_ttr_by_lang,
    )

    docs = _docs(spark, sf_dir)
    tokens: dict[str, list[str]] = {}
    for d in docs:
        tokens.setdefault(d.lang, []).extend(_pywords(d.text))
    got = {r.lang: (r.n_tokens, r.n_types, r.ttr_ppm) for r in q_text_ttr_by_lang(spark, sf_dir).collect()}
    assert set(got) == set(tokens)
    for lang, toks in tokens.items():
        want = (len(toks), len(set(toks)), round(len(set(toks)) / len(toks) * 1e6))
        assert got[lang] == want


def test_charclass_matches_bruteforce(spark, sf_dir):
    from page_rank_mapreduce_java_spark.functions.text_queries2 import (
        q_text_charclass_by_lang,
    )

    docs = _docs(spark, sf_dir)
    agg: dict[str, list[int]] = {}
    for d in docs:
        a = agg.setdefault(d.lang, [0, 0, 0, 0])
        a[0] += len(d.text)
        a[1] += sum(1 for ch in d.text if "A" <= ch <= "Z")
        a[2] += sum(1 for ch in d.text if ch.isdigit())
        a[3] += d.text.count(" ")
    got = {
        r.lang: (r.n_chars, r.upper_ppm, r.digit_ppm, r.space_ppm)
        for r in q_text_charclass_by_lang(spark, sf_dir).collect()
    }
    for lang, (n, u, dg, sp) in agg.items():
        assert got[lang] == (
            n,
            round(u / n * 1e6),
            round(dg / n * 1e6),
            round(sp / n * 1e6),
        )


def test_prefix_dup_matches_bruteforce(spark, sf_dir):
    from page_rank_mapreduce_java_spark.functions.text_queries2 import (
        PREFIX_LEN,
        q_text_prefix_dup_rate,
    )

    docs = _docs(spark, sf_dir)
    per_src: dict[str, list[str]] = {}
    for d in docs:
        per_src.setdefault(d.source, []).append(
            hashlib.md5(d.text[:PREFIX_LEN].encode()).hexdigest()
        )
    got = {
        r.source: (r.n_docs, r.n_prefixes, r.dup_ppm)
        for r in q_text_prefix_dup_rate(spark, sf_dir).collect()
    }
    for src, hs in per_src.items():
        nd, np = len(hs), len(set(hs))
        assert got[src] == (nd, np, round((nd - np) / nd * 1e6))


def test_ngram_novelty_matches_bruteforce(spark, sf_dir):
    from page_rank_mapreduce_java_spark.functions.text_queries2 import (
        q_text_ngram_novelty,
    )

    docs = sorted(_docs(spark, sf_dir), key=lambda d: d.doc_id)
    first: dict[str, int] = {}
    for d in docs:
        for s in _pyshingles(_pywords(d.text)):
            first.setdefault(s, d.doc_id)
    per_src: dict[str, list[int]] = {}
    for d in docs:
        sh = _pyshingles(_pywords(d.text))
        a = per_src.setdefault(d.source, [0, 0])
        a[0] += len(sh)
        a[1] += sum(1 for s in sh if first[s] == d.doc_id)
    got = {
        r.source: (r.n_shingles, r.n_novel, r.novelty_ppm)
        for r in q_text_ngram_novelty(spark, sf_dir).collect()
    }
    for src, (ns, nv) in per_src.items():
        assert got[src] == (ns, nv, round(nv / ns * 1e6))
