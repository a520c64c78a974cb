"""BM25 ranking + per-source curation stats (operators/ranking.py).

Covers: numeric parity with an independent pure-python BM25, the
shuffle-free tf plan shape, and the DuckDB oracle twin (the gate re-runs
the same pair at sf0.01; these tests pin the semantics at fixture size).
"""

import math

import numpy as np
import pytest

from i3dm_export_spark.operators.ranking import (
    BM25_K1,
    BM25_B,
    SOURCE_STATS_ORACLE_SQL,
    bm25_oracle_sql,
    bm25_rank,
    source_stats,
)

TERMS = ("spark", "window", "hash")


@pytest.fixture()
def docs(spark):
    rows = [
        (0, "spark window spark hash join", "en", "a.example", 28),
        (1, "window window window", "en", "a.example", 20),
        (2, "hash table scan", "fr", "b.example", 15),
        (3, "no relevant terms here", "en", "b.example", 22),
        (4, "", "en", "c.example", 0),
        (5, "spark", "de", "c.example", 5),
        (6, "no relevant terms here", "en", "c.example", 22),  # exact dup of 3
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars int"
    )


def _py_bm25(texts, terms, k1=BM25_K1, b=BM25_B):
    toks = [t.lower().split() for t in texts]
    dls = [len(tk) if tk else 0 for tk in toks]
    n = len(texts)
    avgdl = sum(dls) / n
    out = []
    for tk, dl in zip(toks, dls):
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            df = sum(1 for other in toks if term in other)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))
        out.append(round(s, 6))
    return out


class TestBm25:
    def test_matches_pure_python(self, spark, docs):
        got = {
            r["doc_id"]: r["bm25"]
            for r in bm25_rank(docs, TERMS).collect()
        }
        texts = [r["text"] for r in docs.orderBy("doc_id").collect()]
        want = _py_bm25(texts, TERMS)
        for i, w in enumerate(want):
            assert got[i] == pytest.approx(w, abs=1e-6), i

    def test_empty_doc_scores_zero(self, spark, docs):
        row = bm25_rank(docs, TERMS).filter("doc_id = 4").first()
        assert row["dl"] == 0 and row["bm25"] == 0.0

    def test_matches_duckdb_oracle(self, spark, docs):
        import duckdb

        pdf = docs.toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        want = {
            int(r[0]): (int(r[1]), float(r[2]))
            for r in con.sql(bm25_oracle_sql(TERMS)).fetchall()
        }
        got = {
            r["doc_id"]: (r["dl"], r["bm25"])
            for r in bm25_rank(docs, TERMS).collect()
        }
        assert got == {k: (v[0], pytest.approx(v[1], abs=1e-9))
                       for k, v in want.items()} or got == want

    def test_plan_is_projection_plus_scalar_agg(self, spark, docs):
        """tf/dl are projections and the stats side is a broadcast: the
        plan must contain NO wide Exchange on the document side (only the
        single-row aggregate exchanges) and no explode/generate."""
        plan = bm25_rank(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
        assert "Generate" not in plan  # no explode
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # the only sort-merge-style shuffle would come from a join on doc
        # keys — there is none
        assert "SortMergeJoin" not in plan


class TestSourceStats:
    def test_values(self, spark, docs):
        got = {r["source"]: r for r in source_stats(docs).collect()}
        assert got["a.example"]["n_docs"] == 2
        assert got["a.example"]["dup_rate"] == 0.0
        # c.example: doc 6 duplicates doc 3's text? doc 3 is b.example —
        # within c.example all three texts are distinct
        assert got["c.example"]["n_docs"] == 3
        assert got["c.example"]["n_unique"] == 3
        assert got["b.example"]["n_langs"] == 2

    def test_dup_rate_counts_exact_copies(self, spark):
        rows = [(i, "same text", "en", "dup.example", 9) for i in range(4)] + [
            (9, "other", "en", "dup.example", 5)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, n_chars int",
        )
        r = source_stats(df).first()
        assert r["n_docs"] == 5 and r["n_unique"] == 2
        assert r["dup_rate"] == pytest.approx(0.6)

    def test_matches_duckdb_oracle(self, spark, docs):
        import duckdb

        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(con.sql(SOURCE_STATS_ORACLE_SQL).fetchall())
        got = sorted(
            tuple(r) for r in source_stats(docs).collect()
        )
        assert [w[0] for w in want] == [g[0] for g in got]
        for w, g in zip(want, got):
            assert tuple(w)[:3] == tuple(g)[:3]
            assert w[3] == pytest.approx(g[3], abs=1e-9)
            assert w[4] == g[4]
            assert w[5] == pytest.approx(g[5], abs=1e-9)
