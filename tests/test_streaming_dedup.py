"""Streaming near-dup detection: cross-micro-batch state, batch parity."""

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from i3dm_export_spark.streaming.dedup import streaming_near_dup

DOCS_SCHEMA = "doc_id string, text string"


def _write_drop(path, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
            }
        ),
        path,
    )


TEXT_A = "the quick brown fox jumps over the lazy dog near the river bank"
TEXT_B = "completely different content about spark streaming state stores"
TEXT_C = "yet another unrelated document discussing parquet column pruning"


class TestStreamingNearDup:
    def test_cross_batch_duplicate_flagged(self, spark, tmp_path):
        """Drop 1 seeds the bucket state; a copy arriving in drop 2 (a
        separate micro-batch via maxFilesPerTrigger=1) is flagged against
        drop 1's first-seen doc."""
        src = tmp_path / "in"
        src.mkdir()
        _write_drop(src / "drop0.parquet",
                    [("a1", TEXT_A), ("b1", TEXT_B)])
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order
        _write_drop(src / "drop1.parquet",
                    [("a2", TEXT_A), ("c1", TEXT_C)])

        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        flags = streaming_near_dup(stream, n_bands=4, rows_per_band=2)
        q = (
            flags.writeStream.format("memory")
            .queryName("dup_flags")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination(180)

        got = {
            (r["doc_id"], r["dup_of"])
            for r in spark.sql(
                "select distinct doc_id, dup_of from dup_flags"
            ).collect()
        }
        assert ("a2", "a1") in got
        # the unique docs never flag
        assert not any(d in ("b1", "c1") for d, _ in got)

    def test_batch_parity_on_union(self, spark, tmp_path):
        """The streaming candidate PAIRS equal the batch LSH candidate
        pairs over the union corpus (same signature code path)."""
        from i3dm_export_spark.operators.dedup import lsh_candidate_pairs

        rows1 = [("d1", TEXT_A), ("d2", TEXT_B)]
        rows2 = [("d3", TEXT_A + " with a tiny suffix"), ("d4", TEXT_C),
                 ("d5", TEXT_B)]
        src = tmp_path / "in"
        src.mkdir()
        _write_drop(src / "drop0.parquet", rows1)
        time.sleep(1.1)
        _write_drop(src / "drop1.parquet", rows2)

        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        flags = streaming_near_dup(stream, n_bands=4, rows_per_band=2)
        q = (
            flags.writeStream.format("memory")
            .queryName("dup_flags2")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .start()
        )
        q.awaitTermination(180)
        got_pairs = {
            tuple(sorted((r["doc_id"], r["dup_of"])))
            for r in spark.sql(
                "select distinct doc_id, dup_of from dup_flags2"
            ).collect()
        }

        from i3dm_export_spark.operators.dedup import minhash_signatures

        union = spark.createDataFrame(rows1 + rows2, DOCS_SCHEMA)
        sigs = minhash_signatures(union, n_bands=4, rows_per_band=2)
        want_pairs = {
            tuple(sorted((r["a"], r["b"])))
            for r in lsh_candidate_pairs(sigs).collect()
        }
        assert got_pairs == want_pairs

    def test_degenerate_bucket_capped(self, spark, tmp_path):
        """VERDICT r3 item 3: one boilerplate bucket must not emit O(docs)
        candidates — emissions stop at max_bucket_size and the suppression
        persists into later micro-batches (counter lives in state)."""
        src = tmp_path / "in"
        src.mkdir()
        _write_drop(
            src / "drop0.parquet",
            [(f"x{i:03d}", TEXT_A) for i in range(10)],
        )
        time.sleep(1.1)
        _write_drop(
            src / "drop1.parquet",
            [(f"y{i:03d}", TEXT_A) for i in range(10)],
        )
        stream = (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        flags = streaming_near_dup(
            stream, n_bands=4, rows_per_band=2, max_bucket_size=5
        )
        q = (
            flags.writeStream.format("memory")
            .queryName("dup_flags_cap")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt_cap"))
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql(
            "select doc_id, dup_of, band from dup_flags_cap"
        ).collect()
        # identical texts share every band bucket: uncapped this would be
        # 19 flagged docs x 4 bands = 76 rows; capped it is 4 per band
        # (arrivals 2..5) and NOTHING from the second micro-batch
        per_band = {}
        for r in rows:
            per_band.setdefault(r["band"], set()).add(r["doc_id"])
        assert per_band, "expected some candidate rows below the cap"
        for band, docs in per_band.items():
            assert len(docs) <= 4, (band, docs)
            assert not any(d.startswith("y") for d in docs)
