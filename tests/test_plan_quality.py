"""Physical-plan quality gates: the optimizations the 100 TB design relies
on must be visible in `.explain` output — pushdown to the parquet scan,
broadcast joins for small sides, whole-stage codegen for JVM expressions.
These tests pin the plan SHAPE so a regression that silently de-optimizes
(e.g., a UDF sneaking into a filter, a broadcast turning into a shuffle)
fails loudly.
"""

import io
from contextlib import redirect_stdout

import pytest

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestPushdown:
    def test_filter_pushed_to_parquet_scan(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = _plan(docs.filter("lang = 'en'").select("doc_id"))
        assert "PushedFilters" in plan
        assert "lang" in plan.split("PushedFilters")[1][:200]

    def test_column_pruning(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = _plan(docs.select("doc_id"))
        # ReadSchema must not include the heavy text column
        read_schema = plan.split("ReadSchema")[1][:200]
        assert "text" not in read_schema
        assert "doc_id" in read_schema

    def test_bbox_predicate_pushed(self, spark):
        """P1: the spatial range predicate reaches the scan when lon/lat are
        physical columns (the 100 TB layout stores them materialized)."""
        import pandas as pd

        from i3dm_export_spark.sources.pages import synthesize_pages

        pdf = synthesize_pages(1000, "A")
        path = "/tmp/_plan_quality_pages"
        spark.createDataFrame(pdf.drop(columns=["warc_ts", "html", "tags"])).write.mode(
            "overwrite"
        ).parquet(path)
        pages = spark.read.parquet(path)
        plan = _plan(pages.filter("lon >= 34.02 AND lon < 34.06"))
        assert "PushedFilters" in plan
        pushed = plan.split("PushedFilters")[1][:300]
        assert "lon" in pushed


class TestJoinStrategy:
    def test_assignment_join_is_broadcast(self, spark):
        from i3dm_export_spark.config import Bounds, ExportOptions
        from i3dm_export_spark.operators import tiling
        from i3dm_export_spark.sources.pages import DOCS_BBOX
        from i3dm_export_spark.sources.tables import load_table

        load_table(spark, SF_DIR, "documents").createOrReplaceTempView("documents")
        from i3dm_export_spark.sources.pages import INSTANCE_COLS

        inst = spark.sql(f"SELECT {INSTANCE_COLS} FROM documents")
        opts = ExportOptions(max_features_per_tile=50, max_level=6)
        tree = tiling.build_tile_tree(inst, Bounds(*DOCS_BBOX), opts, deep_level=6)
        assigned = tiling.assign_to_content_tiles(inst, tree, opts)
        plan = _plan(assigned)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_rect_pip_is_broadcast_nested_loop_free_of_cartesian(self, spark):
        from pyspark.sql import functions as F

        from i3dm_export_spark.operators.pip import pip_join_rect_sql
        from i3dm_export_spark.sources.pages import INSTANCE_COLS
        from i3dm_export_spark.sources.tables import load_table

        load_table(spark, SF_DIR, "documents").createOrReplaceTempView("documents")
        inst = spark.sql(f"SELECT {INSTANCE_COLS} FROM documents")
        rects = spark.range(4).select(
            F.col("id").alias("boundary_id"),
            (34.0 + F.col("id") * 0.025).alias("min_lon"),
            (34.0 + (F.col("id") + 1) * 0.025).alias("max_lon"),
            F.lit(44.0).alias("min_lat"),
            F.lit(44.1).alias("max_lat"),
        )
        plan = _plan(pip_join_rect_sql(inst, rects))
        # small side broadcast; a plain CartesianProduct would be the fail
        assert "BroadcastNestedLoopJoin" in plan
        assert "CartesianProduct" not in plan


class TestCodegen:
    def test_text_quality_stays_in_wholestage_codegen(self, spark):
        from i3dm_export_spark.functions import text as tx

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        feats = tx.quality_features()
        df = docs.select("doc_id", feats["alpha_ratio"].alias("alpha_ratio"))
        plan = _plan(df)
        # formatted mode marks whole-stage-codegen operators with '* '
        assert "* Project" in plan
        # no python UDF in the plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_dedup_exact_single_shuffle(self, spark):
        from i3dm_export_spark.operators.dedup import exact_dedup

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = _plan(exact_dedup(docs))
        # exactly one Exchange (the hash aggregation shuffle)
        assert plan.count("Exchange") - plan.count("AQEShuffleRead") <= 2
        assert "HashAggregate" in plan


class TestDedupPlans:
    def test_minhash_is_shuffle_free_projection(self, spark):
        """The banded-minhash signature is a pure per-doc projection —
        higher-order functions only: no Exchange, no Python eval."""
        from i3dm_export_spark.operators.dedup import minhash_signatures

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = _plan(minhash_signatures(docs, n_bands=4, rows_per_band=4, shingle_n=9))
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_lsh_pairs_single_shuffle_no_join(self, spark):
        """Pair generation is groupBy + bounded explode — one bucket-key
        shuffle plus the final distinct; NO self-join (a join would
        re-evaluate the signature pipeline per side)."""
        from i3dm_export_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        sigs = minhash_signatures(docs, n_bands=4, rows_per_band=4, shingle_n=9)
        plan = _plan(lsh_candidate_pairs(sigs))
        assert "Join" not in plan
        # bucket groupBy + distinct = two physical shuffles max
        # (formatted explain prints each node twice: tree + detail section)
        import re

        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


class TestNgramJaccardPrune:
    def _parts(self, spark):
        from i3dm_export_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        sigs = minhash_signatures(docs, n_bands=4, rows_per_band=4, shingle_n=9)
        return docs, lsh_candidate_pairs(sigs)

    def test_shingle_scan_is_semi_join_pruned(self, spark):
        """VERDICT r2 item 2: the shingle/size pipeline's input is the
        candidate doc set (LEFT-SEMI against the candidate ids), never the
        whole corpus — at 10^12 docs the unpruned distinct-shingle shuffle
        is ~1000x larger than needed."""
        from i3dm_export_spark.operators.dedup import ngram_jaccard_pairs

        docs, cand = self._parts(spark)
        plan = _plan(ngram_jaccard_pairs(docs, cand, n=3))
        assert "LeftSemi" in plan

    def test_prune_does_not_change_results(self, spark):
        from i3dm_export_spark.operators.dedup import ngram_jaccard_pairs

        docs, cand = self._parts(spark)
        cand = cand.localCheckpoint()  # evaluate once, reuse on both paths
        pruned = (
            ngram_jaccard_pairs(docs, cand, n=3, prune=True)
            .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        unpruned = (
            ngram_jaccard_pairs(docs, cand, n=3, prune=False)
            .toPandas().sort_values(["a", "b"]).reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(pruned, unpruned)


class TestSimilarityPlans:
    def test_embedding_near_dup_no_self_join(self, spark):
        """VERDICT r2 item 1: near-dup is agg-then-local-explode — ONE
        bucket-key shuffle, NO self-join (a join would both re-evaluate the
        signature pipeline twice and make one degenerate bucket an
        unbounded m^2-row shuffle)."""
        import re

        from i3dm_export_spark.operators.similarity import embedding_near_dup
        from i3dm_export_spark.sources.tables import load_table

        emb = load_table(spark, SF_DIR, "embeddings")
        dim = len(emb.select("embedding").first()[0])
        plan = _plan(
            embedding_near_dup(
                emb, threshold=0.3, dim=dim, n_planes=4, max_bucket_size=1000
            )
        )
        assert "Join" not in plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1

    def test_embedding_near_dup_bucket_cap_bounds_pairs(self, spark):
        """Degenerate single-bucket input (n_planes=0, threshold=-1 so no
        cosine filtering): without the cap every pair of the corpus would
        emit; with max_bucket_size below the corpus size the bucket is
        dropped and ZERO pairs come out."""
        from i3dm_export_spark.operators.similarity import embedding_near_dup
        from i3dm_export_spark.sources.tables import load_table

        emb = load_table(spark, SF_DIR, "embeddings").filter("vec_id < 50")
        dim = len(emb.select("embedding").first()[0])
        capped = embedding_near_dup(
            emb, threshold=-1.0, dim=dim, n_planes=0, max_bucket_size=10
        )
        assert capped.count() == 0
        uncapped = embedding_near_dup(emb, threshold=-1.0, dim=dim, n_planes=0)
        assert uncapped.count() == 50 * 49 // 2

    def test_ivf_probe_join_broadcasts_queries(self, spark):
        from i3dm_export_spark.operators.similarity import ivf_ann
        from i3dm_export_spark.sources.tables import load_table

        emb = load_table(spark, SF_DIR, "embeddings")
        plan = _plan(ivf_ann(emb, emb.filter("vec_id < 5"), 3, n_lists=4, n_probe=2))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestSkewPlans:
    def test_salt_flag_join_is_broadcast(self, spark):
        from pyspark.sql import functions as F

        from i3dm_export_spark.operators import skew

        df = spark.range(1000).select(
            F.lit(3).alias("level"), (F.col("id") % 4).alias("x"),
            F.lit(0).alias("y"), F.col("id").cast("string").alias("url"),
        )
        counts = df.groupBy("level", "x", "y").agg(F.count(F.lit(1)).alias("_n"))
        hot = skew.hot_cell_keys(counts, 100)
        plan = _plan(skew.add_salt_for_hot(df, hot, 8, id_col="url"))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestAsofPlan:
    def test_asof_join_one_shuffle_no_python(self, spark):
        """The as-of operator itself must cost exactly one exchange (the
        window partition over the union) and stay JVM-side."""
        import pandas as pd

        from i3dm_export_spark.operators.asof import asof_join_backward

        left = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2], "k": [1, 1], "t": [5.0, 9.0]})
        )
        right = spark.createDataFrame(
            pd.DataFrame({"k": [1], "t": [4.0], "v": [1.0]})
        )
        df = asof_join_backward(left, right, on=["k"], left_ts="t",
                                right_ts="t", value_cols=["v"])
        plan = _plan(df)
        assert "Window" in plan
        # formatted mode prints each operator in the tree AND the detail
        # block, so one physical Exchange counts twice
        assert plan.count("Exchange") - plan.count("AQEShuffleRead") <= 2
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan


class TestBucketedJoin:
    def test_bucketed_join_eliminates_shuffle(self, spark, tmp_path):
        """Two tables bucketed on the join key must sort-merge join with
        ZERO Exchange operators — the co-location contract the 100 TB
        design leans on for repeated joins (README scale design)."""
        from i3dm_export_spark.sources.tables import save_bucketed

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        scores = docs.selectExpr("doc_id", "n_chars * 2 AS score")
        save_bucketed(docs, "t_docs_b", ["doc_id"], n_buckets=8)
        save_bucketed(scores, "t_scores_b", ["doc_id"], n_buckets=8)
        try:
            a = spark.table("t_docs_b")
            b = spark.table("t_scores_b")
            # merge hint: the sf0.01 tables are small enough that AQE would
            # broadcast (hiding the layout); at real scale SMJ is the
            # strategy and the bucketing is what removes its exchanges
            joined = (
                a.hint("merge").join(b, "doc_id")
                .select("doc_id", "lang", "score")
            )
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan.replace("AQEShuffleRead", "")
            assert joined.count() == docs.count()
        finally:
            spark.sql("DROP TABLE IF EXISTS t_docs_b")
            spark.sql("DROP TABLE IF EXISTS t_scores_b")
